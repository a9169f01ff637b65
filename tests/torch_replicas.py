"""Test-only torch replicas of the reference model architectures.

These reproduce the reference module trees (same state-dict key names, same
hyper-parameters — ``/root/reference/src/ocrfa/modules/blocks.py``) so that:

1. randomly-initialised torch weights can be run through the production
   checkpoint converter (:mod:`ocrfa_tpu.checkpoints`), and
2. the JAX models can be asserted numerically equal to the torch forward.

They are fixtures, not product code; real checkpoints from the reference
model zoo load through the exact same converter path.
"""

import torch
import torch.nn as nn


class BidirectionalLSTM(nn.Module):
    def __init__(self, input_size, hidden_size, output_size):
        super().__init__()
        self.rnn = nn.LSTM(input_size, hidden_size, bidirectional=True, batch_first=True)
        self.linear = nn.Linear(hidden_size * 2, output_size)

    def forward(self, x):
        return self.linear(self.rnn(x)[0])


class BlockB(nn.Module):
    def __init__(self, inplanes, planes, stride=1, down_sample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = down_sample

    def forward(self, x):
        residual = self.downsample(x) if self.downsample is not None else x
        return self.relu(self.bn2(self.conv2(self.relu(self.bn1(self.conv1(x))))) + residual)


class RefResNet(nn.Module):
    """Recognition ResNet, layers [1, 2, 5, 3] (blocks.py:226-391)."""

    def __init__(self, input_channel, output_channel, w8=False,
                 late_channel=None):
        super().__init__()
        self.w8 = w8  # gen1w8 serving variant: /8 pool strides width too
        # late_channel: thin layer3/4 only (the gen1t serving variant,
        # models/crnn.py init_crnn_gen1)
        oc = [output_channel // 4, output_channel // 2,
              late_channel or output_channel, late_channel or output_channel]
        self.inplanes = output_channel // 8
        self.conv0_1 = nn.Conv2d(input_channel, output_channel // 16, 3, 1, 1, bias=False)
        self.bn0_1 = nn.BatchNorm2d(output_channel // 16)
        self.conv0_2 = nn.Conv2d(output_channel // 16, self.inplanes, 3, 1, 1, bias=False)
        self.bn0_2 = nn.BatchNorm2d(self.inplanes)
        self.relu = nn.ReLU(inplace=True)

        self.max_pool1 = nn.MaxPool2d(2, 2)
        self.layer1 = self._make_layer(oc[0], 1)
        self.conv1 = nn.Conv2d(oc[0], oc[0], 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(oc[0])

        self.max_pool2 = nn.MaxPool2d(2, 2)
        self.layer2 = self._make_layer(oc[1], 2)
        self.conv2 = nn.Conv2d(oc[1], oc[1], 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(oc[1])

        self.max_pool3 = nn.MaxPool2d(2, (2, 2 if w8 else 1), (0, 1))
        self.layer3 = self._make_layer(oc[2], 5)
        self.conv3 = nn.Conv2d(oc[2], oc[2], 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(oc[2])

        self.layer4 = self._make_layer(oc[3], 3)
        self.conv4_1 = nn.Conv2d(oc[3], oc[3], 2, (2, 1), (0, 1), bias=False)
        self.bn4_1 = nn.BatchNorm2d(oc[3])
        self.conv4_2 = nn.Conv2d(oc[3], oc[3], 2, 1, 0, bias=False)
        self.bn4_2 = nn.BatchNorm2d(oc[3])

    def _make_layer(self, planes, blocks, stride=1):
        down = None
        if stride != 1 or self.inplanes != planes:
            down = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        layers = [BlockB(self.inplanes, planes, stride, down)]
        self.inplanes = planes
        layers += [BlockB(planes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn0_2(self.conv0_2(self.relu(self.bn0_1(self.conv0_1(x))))))
        x = self.relu(self.bn1(self.conv1(self.layer1(self.max_pool1(x)))))
        x = self.relu(self.bn2(self.conv2(self.layer2(self.max_pool2(x)))))
        x = self.relu(self.bn3(self.conv3(self.layer3(self.max_pool3(x)))))
        x = self.layer4(x)
        x = self.relu(self.bn4_1(self.conv4_1(x)))
        return self.relu(self.bn4_2(self.conv4_2(x)))


class _FeatWrap(nn.Module):
    def __init__(self, net):
        super().__init__()
        self.ConvNet = net

    def forward(self, x):
        return self.ConvNet(x)


class Gen1Model(nn.Module):
    """gen1 ``Model`` replica (blocks.py:422-447)."""

    def __init__(self, num_class, input_channel=1, output_channel=512,
                 hidden_size=512, w8=False, late_channel=None):
        super().__init__()
        self.FeatureExtraction = _FeatWrap(
            RefResNet(input_channel, output_channel, w8=w8,
                      late_channel=late_channel))
        self.AdaptiveAvgPool = nn.AdaptiveAvgPool2d((None, 1))
        self.SequenceModeling = nn.Sequential(
            BidirectionalLSTM(late_channel or output_channel, hidden_size,
                              hidden_size),
            BidirectionalLSTM(hidden_size, hidden_size, hidden_size),
        )
        self.Prediction = nn.Linear(hidden_size, num_class)

    def forward(self, x, *args):
        feats = self.FeatureExtraction(x)
        seq = self.AdaptiveAvgPool(feats.permute(0, 3, 1, 2)).squeeze(3)
        return self.Prediction(self.SequenceModeling(seq))


class VGGExtractor(nn.Module):
    """gen2 VGG extractor replica (blocks.py:105-183)."""

    def __init__(self, input_channel, output_channel=256):
        super().__init__()
        oc = [output_channel // 8, output_channel // 4, output_channel // 2, output_channel]
        self.ConvNet = nn.Sequential(
            nn.Conv2d(input_channel, oc[0], 3, 1, 1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(oc[0], oc[1], 3, 1, 1), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(oc[1], oc[2], 3, 1, 1), nn.ReLU(True),
            nn.Conv2d(oc[2], oc[2], 3, 1, 1), nn.ReLU(True),
            nn.MaxPool2d((2, 1), (2, 1)),
            nn.Conv2d(oc[2], oc[3], 3, 1, 1, bias=False), nn.BatchNorm2d(oc[3]), nn.ReLU(True),
            nn.Conv2d(oc[3], oc[3], 3, 1, 1, bias=False), nn.BatchNorm2d(oc[3]), nn.ReLU(True),
            nn.MaxPool2d((2, 1), (2, 1)),
            nn.Conv2d(oc[3], oc[3], 2, 1, 0), nn.ReLU(True),
        )

    def forward(self, x):
        return self.ConvNet(x)


class Gen2Model(nn.Module):
    """gen2 ``VGGModel`` replica, with the reference's constructor defect
    (undefined ``self.output_channel``, blocks.py:407) fixed."""

    def __init__(self, num_class, input_channel=1, output_channel=256, hidden_size=256):
        super().__init__()
        self.FeatureExtraction = VGGExtractor(input_channel, output_channel)
        self.AdaptiveAvgPool = nn.AdaptiveAvgPool2d((None, 1))
        self.SequenceModeling = nn.Sequential(
            BidirectionalLSTM(output_channel, hidden_size, hidden_size),
            BidirectionalLSTM(hidden_size, hidden_size, hidden_size),
        )
        self.Prediction = nn.Linear(hidden_size, num_class)

    def forward(self, x, *args):
        feats = self.FeatureExtraction(x)
        seq = self.AdaptiveAvgPool(feats.permute(0, 3, 1, 2)).squeeze(3)
        return self.Prediction(self.SequenceModeling(seq))


def _vgg16_bn_features():
    """torchvision vgg16_bn.features layout (indices matter for slicing)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M"]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
            cin = v
    return nn.Sequential(*layers)


class Vgg16BN(nn.Module):
    """Reference Vgg16BN replica (blocks.py:24-82), pretrained=False."""

    def __init__(self):
        super().__init__()
        feats = _vgg16_bn_features()
        self.slice1 = nn.Sequential()
        self.slice2 = nn.Sequential()
        self.slice3 = nn.Sequential()
        self.slice4 = nn.Sequential()
        for x in range(12):
            self.slice1.add_module(str(x), feats[x])
        for x in range(12, 19):
            self.slice2.add_module(str(x), feats[x])
        for x in range(19, 29):
            self.slice3.add_module(str(x), feats[x])
        for x in range(29, 39):
            self.slice4.add_module(str(x), feats[x])
        self.slice5 = nn.Sequential(
            nn.MaxPool2d(kernel_size=3, stride=1, padding=1),
            nn.Conv2d(512, 1024, kernel_size=3, padding=6, dilation=6),
            nn.Conv2d(1024, 1024, kernel_size=1),
        )

    def forward(self, x):
        h = self.slice1(x)
        h_relu2_2 = h
        h = self.slice2(h)
        h_relu3_2 = h
        h = self.slice3(h)
        h_relu4_3 = h
        h = self.slice4(h)
        h_relu5_3 = h
        h_fc7 = self.slice5(h)
        return h_fc7, h_relu5_3, h_relu4_3, h_relu3_2, h_relu2_2


class DoubleConv(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(in_ch + mid_ch, mid_ch, kernel_size=1),
            nn.BatchNorm2d(mid_ch), nn.ReLU(inplace=True),
            nn.Conv2d(mid_ch, out_ch, kernel_size=3, padding=1),
            nn.BatchNorm2d(out_ch), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.conv(x)


class CraftModel(nn.Module):
    """Reference OCRFA CRAFT replica (utils.py:48-98)."""

    def __init__(self):
        super().__init__()
        self.basenet = Vgg16BN()
        self.upconv1 = DoubleConv(1024, 512, 256)
        self.upconv2 = DoubleConv(512, 256, 128)
        self.upconv3 = DoubleConv(256, 128, 64)
        self.upconv4 = DoubleConv(128, 64, 32)
        self.conv_cls = nn.Sequential(
            nn.Conv2d(32, 32, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(16, 16, 1), nn.ReLU(inplace=True),
            nn.Conv2d(16, 2, 1),
        )

    def forward(self, x):
        import torch.nn.functional as F

        s = self.basenet(x)
        y = torch.cat([s[0], s[1]], dim=1)
        y = self.upconv1(y)
        y = F.interpolate(y, size=s[2].size()[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s[2]], dim=1)
        y = self.upconv2(y)
        y = F.interpolate(y, size=s[3].size()[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s[3]], dim=1)
        y = self.upconv3(y)
        y = F.interpolate(y, size=s[4].size()[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s[4]], dim=1)
        feature = self.upconv4(y)
        y = self.conv_cls(feature)
        return y.permute(0, 2, 3, 1), feature


class DBBasicBlock(nn.Module):
    """DBNet backbone BasicBlock, plain conv2 (dcn=None path,
    backbones/resnet.py:37-108)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class DBResNet18(nn.Module):
    """DBNet backbone ResNet-18 returning the C2..C5 pyramid
    (backbones/resnet.py:188-254)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 2)
        self.layer2 = self._make_layer(128, 2, stride=2)
        self.layer3 = self._make_layer(256, 2, stride=2)
        self.layer4 = self._make_layer(512, 2, stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        layers = [DBBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [DBBasicBlock(planes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x2 = self.layer1(x)
        x3 = self.layer2(x2)
        x4 = self.layer3(x3)
        x5 = self.layer4(x4)
        return x2, x3, x4, x5


class SegDetectorRef(nn.Module):
    """SegDetector replica (decoders/seg_detector.py:7-152), inference path."""

    def __init__(self, in_channels=(64, 128, 256, 512), inner_channels=256,
                 k=50, bias=False, adaptive=True):
        super().__init__()
        self.k = k
        self.up5 = nn.Upsample(scale_factor=2, mode="nearest")
        self.up4 = nn.Upsample(scale_factor=2, mode="nearest")
        self.up3 = nn.Upsample(scale_factor=2, mode="nearest")
        self.in5 = nn.Conv2d(in_channels[-1], inner_channels, 1, bias=bias)
        self.in4 = nn.Conv2d(in_channels[-2], inner_channels, 1, bias=bias)
        self.in3 = nn.Conv2d(in_channels[-3], inner_channels, 1, bias=bias)
        self.in2 = nn.Conv2d(in_channels[-4], inner_channels, 1, bias=bias)
        self.out5 = nn.Sequential(
            nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias),
            nn.Upsample(scale_factor=8, mode="nearest"))
        self.out4 = nn.Sequential(
            nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias),
            nn.Upsample(scale_factor=4, mode="nearest"))
        self.out3 = nn.Sequential(
            nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias),
            nn.Upsample(scale_factor=2, mode="nearest"))
        self.out2 = nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias)
        self.binarize = nn.Sequential(
            nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias),
            nn.BatchNorm2d(inner_channels // 4), nn.ReLU(inplace=True),
            nn.ConvTranspose2d(inner_channels // 4, inner_channels // 4, 2, 2),
            nn.BatchNorm2d(inner_channels // 4), nn.ReLU(inplace=True),
            nn.ConvTranspose2d(inner_channels // 4, 1, 2, 2),
            nn.Sigmoid())
        if adaptive:
            self.thresh = nn.Sequential(
                nn.Conv2d(inner_channels, inner_channels // 4, 3, padding=1, bias=bias),
                nn.BatchNorm2d(inner_channels // 4), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(inner_channels // 4, inner_channels // 4, 2, 2),
                nn.BatchNorm2d(inner_channels // 4), nn.ReLU(inplace=True),
                nn.ConvTranspose2d(inner_channels // 4, 1, 2, 2),
                nn.Sigmoid())

    def forward(self, features):
        c2, c3, c4, c5 = features
        in5, in4, in3, in2 = self.in5(c5), self.in4(c4), self.in3(c3), self.in2(c2)
        out4 = self.up5(in5) + in4
        out3 = self.up4(out4) + in3
        out2 = self.up3(out3) + in2
        p5 = self.out5(in5)
        p4 = self.out4(out4)
        p3 = self.out3(out3)
        p2 = self.out2(out2)
        fuse = torch.cat((p5, p4, p3, p2), 1)
        return self.binarize(fuse)


class DBNetRefModel(nn.Module):
    """BasicModel replica (backbone + decoder, DBNet/model/model.py:13-21)."""

    def __init__(self):
        super().__init__()
        self.backbone = DBResNet18()
        self.decoder = SegDetectorRef()

    def forward(self, x):
        return self.decoder(self.backbone(x))


# ---------------------------------------------------------------------------
# MobileNetV3 backbone (DBNet/backbones/mobilenetv3.py)


class _Hswish(nn.Module):
    def forward(self, x):
        return x * torch.nn.functional.relu6(x + 3.0) / 6.0


class _Hsigmoid(nn.Module):
    def forward(self, x):
        return torch.nn.functional.relu6(x + 3.0) / 6.0


class _SEModule(nn.Module):
    def __init__(self, channel, reduction=4):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Linear(channel, channel // reduction, bias=False),
            nn.ReLU(inplace=True),
            nn.Linear(channel // reduction, channel, bias=False),
            _Hsigmoid())

    def forward(self, x):
        b, c, _, _ = x.size()
        y = self.avg_pool(x).view(b, c)
        return x * self.fc(y).view(b, c, 1, 1)


class _MobileBottleneck(nn.Module):
    """MobileBottleneck replica (mobilenetv3.py:76-117): the ``conv``
    Sequential indexes pw/bn/nl/dw/bn/SE/nl/pw-linear/bn at 0-8."""

    def __init__(self, inp, oup, kernel, stride, exp, se, nl):
        super().__init__()
        self.use_res_connect = stride == 1 and inp == oup
        nlin = _Hswish if nl == "HS" else nn.ReLU
        pad = (kernel - 1) // 2
        self.conv = nn.Sequential(
            nn.Conv2d(inp, exp, 1, 1, 0, bias=False),
            nn.BatchNorm2d(exp),
            nlin(),
            nn.Conv2d(exp, exp, kernel, stride, pad, groups=exp, bias=False),
            nn.BatchNorm2d(exp),
            _SEModule(exp) if se else nn.Identity(),
            nlin(),
            nn.Conv2d(exp, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        )

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res_connect else y


_MNV3_SETTINGS = {
    "large": [
        (3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2),
        (3, 72, 24, False, "RE", 1), (5, 72, 40, True, "RE", 2),
        (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1),
        (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
        (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
        (5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1),
        (5, 960, 160, True, "HS", 1),
    ],
    "small": [
        (3, 16, 16, True, "RE", 2), (3, 72, 24, False, "RE", 2),
        (3, 88, 24, False, "RE", 1), (5, 96, 40, True, "HS", 2),
        (5, 240, 40, True, "HS", 1), (5, 240, 40, True, "HS", 1),
        (5, 120, 48, True, "HS", 1), (5, 144, 48, True, "HS", 1),
        (5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1),
        (5, 576, 96, True, "HS", 1),
    ],
}
_MNV3_TAPS = {"large": (3, 6, 12), "small": (1, 3, 8)}
_MNV3_LAST = {"large": 960, "small": 576}


class MobileNetV3Ref(nn.Module):
    """Backbone replica (mobilenetv3.py:120-220), detector forward taps.

    The reference's small forward indexes past its feature list and crashes
    (``range(17)`` over 13 features, :210); like the production rebuild this
    replica taps the last block of each resolution instead."""

    def __init__(self, mode="large"):
        super().__init__()
        self.mode = mode
        feats = [nn.Sequential(
            nn.Conv2d(3, 16, 3, 2, 1, bias=False), nn.BatchNorm2d(16), _Hswish())]
        cin = 16
        for k, exp, c, se, nl, s in _MNV3_SETTINGS[mode]:
            feats.append(_MobileBottleneck(cin, c, k, s, exp, se, nl))
            cin = c
        last = _MNV3_LAST[mode]
        feats.append(nn.Sequential(
            nn.Conv2d(cin, last, 1, 1, 0, bias=False), nn.BatchNorm2d(last),
            _Hswish()))
        self.features = nn.ModuleList(feats)

    def forward(self, x):
        taps = []
        for i, stage in enumerate(self.features):
            x = stage(x)
            if i in _MNV3_TAPS[self.mode]:
                taps.append(x)
        taps.append(x)
        return tuple(taps)


# ---------------------------------------------------------------------------
# ASF decoder (DBNet/decoders/seg_detector_asf.py + feature_attention.py)


class ScaleSpatialAttentionRef(nn.Module):
    def __init__(self, in_planes, out_planes, num_features):
        super().__init__()
        self.spatial_wise = nn.Sequential(
            nn.Conv2d(1, 1, 3, bias=False, padding=1), nn.ReLU(),
            nn.Conv2d(1, 1, 1, bias=False), nn.Sigmoid())
        self.attention_wise = nn.Sequential(
            nn.Conv2d(in_planes, num_features, 1, bias=False), nn.Sigmoid())

    def forward(self, x):
        g = torch.mean(x, dim=1, keepdim=True)
        g = self.spatial_wise(g) + x
        return self.attention_wise(g)


class ScaleChannelSpatialAttentionRef(nn.Module):
    def __init__(self, in_planes, out_planes, num_features):
        super().__init__()
        self.channel_wise = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_planes, out_planes, 1, bias=False), nn.ReLU(),
            nn.Conv2d(out_planes, in_planes, 1, bias=False))
        self.spatial_wise = nn.Sequential(
            nn.Conv2d(1, 1, 3, bias=False, padding=1), nn.ReLU(),
            nn.Conv2d(1, 1, 1, bias=False), nn.Sigmoid())
        self.attention_wise = nn.Sequential(
            nn.Conv2d(in_planes, num_features, 1, bias=False), nn.Sigmoid())

    def forward(self, x):
        g = self.channel_wise(x).sigmoid()
        g = g + x
        m = torch.mean(g, dim=1, keepdim=True)
        g = self.spatial_wise(m) + g
        return self.attention_wise(g)


class ScaleChannelAttentionRef(nn.Module):
    def __init__(self, in_planes, out_planes, num_features):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(in_planes, out_planes, 1, bias=False)
        self.bn = nn.BatchNorm2d(out_planes)
        self.fc2 = nn.Conv2d(out_planes, num_features, 1, bias=False)

    def forward(self, x):
        g = self.avgpool(x)
        g = torch.nn.functional.relu(self.bn(self.fc1(g)))
        g = self.fc2(g)
        return torch.nn.functional.softmax(g, 1)


class ScaleFeatureSelectionRef(nn.Module):
    """feature_attention.py:113-145."""

    def __init__(self, in_channels, inter_channels, out_features_num=4,
                 attention_type="scale_spatial"):
        super().__init__()
        self.type = attention_type
        self.out_features_num = out_features_num
        self.conv = nn.Conv2d(in_channels, inter_channels, 3, padding=1)
        if attention_type == "scale_spatial":
            self.enhanced_attention = ScaleSpatialAttentionRef(
                inter_channels, inter_channels // 4, out_features_num)
        elif attention_type == "scale_channel_spatial":
            self.enhanced_attention = ScaleChannelSpatialAttentionRef(
                inter_channels, inter_channels // 4, out_features_num)
        else:
            self.enhanced_attention = ScaleChannelAttentionRef(
                inter_channels, inter_channels // 2, out_features_num)

    def forward(self, concat_x, features_list):
        concat_x = self.conv(concat_x)
        score = self.enhanced_attention(concat_x)
        if self.type not in ("scale_channel_spatial", "scale_spatial"):
            score = torch.nn.functional.interpolate(
                score, size=features_list[0].shape[2:], mode="bilinear")
        parts = [score[:, i:i + 1] * features_list[i]
                 for i in range(self.out_features_num)]
        return torch.cat(parts, dim=1)


class SegDetectorASFRef(SegDetectorRef):
    """SegSpatialScaleDetector replica (seg_detector_asf.py:9-120)."""

    def __init__(self, attention_type="scale_spatial", inner_channels=256,
                 **kw):
        super().__init__(inner_channels=inner_channels, **kw)
        self.concat_attention = ScaleFeatureSelectionRef(
            inner_channels, inner_channels // 4, attention_type=attention_type)

    def forward(self, features):
        c2, c3, c4, c5 = features
        in5, in4, in3, in2 = self.in5(c5), self.in4(c4), self.in3(c3), self.in2(c2)
        out4 = self.up5(in5) + in4
        out3 = self.up4(out4) + in3
        out2 = self.up3(out3) + in2
        p5 = self.out5(in5)
        p4 = self.out4(out4)
        p3 = self.out3(out3)
        p2 = self.out2(out2)
        fuse = torch.cat((p5, p4, p3, p2), 1)
        fuse = self.concat_attention(fuse, [p5, p4, p3, p2])
        return self.binarize(fuse)
