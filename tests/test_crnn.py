"""Numerical parity: JAX CRNN vs torch replica through the weight converter."""

import numpy as np
import pytest

from ocrfa_tpu import checkpoints
from ocrfa_tpu.models import crnn


def _state_dict_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


@pytest.fixture(scope="module")
def gen1_pair():
    import torch

    from tests.torch_replicas import Gen1Model

    torch.manual_seed(0)
    # small channel count keeps the CPU test fast; same topology
    model = Gen1Model(num_class=30, output_channel=64, hidden_size=64).eval()
    params = checkpoints.convert_crnn_gen1(_state_dict_numpy(model))
    return model, params


class TestGen1:
    @pytest.mark.parametrize("width", [64, 100, 128])
    def test_forward_parity(self, gen1_pair, width):
        import torch

        model, params = gen1_pair
        rng = np.random.default_rng(width)
        x = rng.standard_normal((2, 64, width, 1), dtype=np.float32)

        with torch.no_grad():
            ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(crnn.crnn_apply(params, x, variant="gen1"))

        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-2)

    def test_sequence_length(self, gen1_pair):
        import torch

        model, _ = gen1_pair
        for width in (64, 128, 256):
            with torch.no_grad():
                t = model(torch.zeros(1, 1, 64, width)).shape[1]
            assert crnn.sequence_length(width, "gen1") == t

    def test_init_shapes_match_converted(self, gen1_pair):
        import jax

        _, params = gen1_pair
        init = crnn.init_crnn_gen1(jax.random.PRNGKey(0), num_class=30,
                                   output_channel=64, hidden_size=64)
        ref_shapes = jax.tree.map(lambda a: a.shape, params)
        init_shapes = jax.tree.map(lambda a: a.shape, init)
        assert ref_shapes == init_shapes


class TestGen1Thin:
    """late_channel thins layer3/4 only; T = W/4+1 preserved; exact torch
    parity through the shape-agnostic export path (gen1t serving variant)."""

    def test_forward_parity_and_seq_len(self):
        import jax
        import torch

        from tests.torch_replicas import Gen1Model

        params = crnn.init_crnn_gen1(jax.random.PRNGKey(3), num_class=30,
                                     output_channel=64, hidden_size=64,
                                     late_channel=48)
        # layer1/2 keep stock widths, layer3/4 thin
        assert params["feat"]["layer2"][0]["conv2"]["w"].shape[-1] == 32
        assert params["feat"]["layer3"][0]["conv2"]["w"].shape[-1] == 48
        assert params["feat"]["conv4_2"]["w"].shape[-1] == 48

        model = Gen1Model(num_class=30, output_channel=64, hidden_size=64,
                          late_channel=48).eval()
        sd = checkpoints.export_crnn_gen1(params)
        model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
            strict=True)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 64, 96, 1), dtype=np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(crnn.crnn_apply(params, x, variant="gen1"))
        assert ours.shape[1] == crnn.sequence_length(96, "gen1")
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-2)


class TestGen2:
    def test_forward_parity(self):
        import torch

        from tests.torch_replicas import Gen2Model

        torch.manual_seed(1)
        model = Gen2Model(num_class=20, output_channel=64, hidden_size=64).eval()
        params = checkpoints.convert_crnn_gen2(_state_dict_numpy(model))

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 64, 128, 1), dtype=np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(crnn.crnn_apply(params, x, variant="gen2"))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-2)

    def test_sequence_length(self):
        assert crnn.sequence_length(128, "gen2") == 31


class TestLSTMOp:
    def test_matches_torch_lstm(self):
        import torch

        from ocrfa_tpu.ops.lstm import bilstm

        torch.manual_seed(2)
        rnn = torch.nn.LSTM(16, 24, bidirectional=True, batch_first=True).eval()
        lin = torch.nn.Linear(48, 24).eval()
        x = torch.randn(3, 10, 16)
        with torch.no_grad():
            ref = lin(rnn(x)[0]).numpy()

        sd = {f"m.rnn.{k}": v.detach().numpy() for k, v in rnn.state_dict().items()}
        sd.update({f"m.linear.{k}": v.detach().numpy() for k, v in lin.state_dict().items()})
        from ocrfa_tpu.checkpoints import _bilstm

        params = _bilstm(sd, "m")
        ours = np.asarray(bilstm(x.numpy(), params))
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-2)  # f32 recurrence noise; exact to 3e-15 in f64
