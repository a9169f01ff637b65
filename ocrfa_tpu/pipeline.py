"""Recognition pipeline: bucketed batched CRNN forward + CTC decode.

TPU-native redesign of the reference driver pair ``recognizer_predict`` /
``get_text`` (``/root/reference/src/ocrfa/utils.py:605-770``):

* The per-crop Python loop (+ torch DataLoader) becomes one batched forward
  per (width, batch) bucket; XLA compiles each bucket once and reuses it.
* softmax -> allowlist mask -> renormalise -> argmax runs on-device
  (:mod:`ocrfa_tpu.decode.device`); only (N, T) index/value arrays return to
  host for string collapse.
* The low-confidence contrast second pass (utils.py:737-756) re-runs only
  the failing crops, batched the same way.

Output parity: crops are replicate-edge padded to the same ``max_width`` the
reference computes, so logits — and therefore decoded strings — match the
torch pipeline character-for-character.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ocrfa_tpu.decode.device import (
    compact_indices,
    ctc_confidences,
    pack_decode_payload,
    unpack_decode_payload,
    decode_greedy_batch,
    greedy_confidences,
    keep_mask_for,
    postprocess_logits,
)
from ocrfa_tpu.models.crnn import crnn_apply
from ocrfa_tpu.preproc.buckets import bucket_for_batch, bucket_for_width
from ocrfa_tpu.preproc.host import align_collate_u8

MAX_DEVICE_BATCH = 512


class Recognizer:
    """Holds device-resident CRNN params and the per-bucket jit cache."""

    def __init__(self, params, converter, variant: str = "gen1",
                 compute_dtype=jnp.float32, mesh=None, quantized=False,
                 calibration_batches=None, act_amax=None):
        """``quantized`` selects the conv-tower numerics for gen1:

        * ``False`` — f32/bf16 per ``compute_dtype`` (bit-parity path);
        * ``True`` / ``"dynamic"`` — dynamic int8, the TPU equivalent of the
          reference's quantize_dynamic default (utils.py:687-690; ~99.96%
          argmax-identical to bf16);
        * ``"static"`` — calibrated static-scale int8 with folded BN (the
          serving fast path; requires ``calibration_batches``: normalized
          f32 crop batches representative of production input — or
          ``act_amax``, a previously computed activation-amax tree, so
          deployments quantize at startup without calibration data.  The
          amax the calibration produced is kept on ``self.act_amax`` for
          persistence, e.g. into a trained-blob's ``meta["act_amax"]``).
        """
        self.converter = converter
        self.variant = variant
        self.mesh = mesh
        # decoder-fusion defaults used when predict() isn't given them
        # explicitly — the hook that makes the fusion decoders reachable
        # from the facade (OCR.readtext(decoder="wordbeamsearch_fast")
        # can't thread a trie through the reference's kwarg surface)
        self.decode_defaults: dict = {}
        self.quantized = quantized if variant in ("gen1", "gen1w8") else False
        self.act_amax = None
        w8 = variant == "gen1w8"
        if self.quantized == "static":
            from ocrfa_tpu.models.quant import (
                calibrate_crnn_gen1,
                crnn_apply_int8_static,
                quantize_crnn_gen1_static,
            )

            if act_amax is not None:
                amax = act_amax
            elif calibration_batches:
                amax = calibrate_crnn_gen1(params, calibration_batches, w8=w8)
            else:
                raise ValueError(
                    "quantized='static' needs calibration_batches "
                    "(normalized f32 crops, e.g. one representative batch) "
                    "or a precomputed act_amax tree"
                )
            self.act_amax = jax.tree.map(np.asarray, amax)
            params = quantize_crnn_gen1_static(params, amax)
            compute_dtype = jnp.float32  # quant path manages its own dtypes
            model_fn = lambda p, v: crnn_apply_int8_static(p, v, w8=w8)
        elif self.quantized:
            from ocrfa_tpu.models.quant import crnn_apply_int8, quantize_crnn_gen1

            params = quantize_crnn_gen1(params)
            compute_dtype = jnp.float32
            model_fn = lambda p, v: crnn_apply_int8(p, v, w8=w8)
        else:
            model_fn = partial(crnn_apply, variant=variant)
        self.compute_dtype = compute_dtype
        if compute_dtype != jnp.float32 and not self.quantized:
            params = jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), params)
        if mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        self.params = jax.device_put(params)
        # the variant/quantization-resolved forward (params, f32 crops) ->
        # logits; consumers composing their own fused programs (e.g.
        # DevicePagePipeline) MUST use this instead of raw crnn_apply —
        # quantized towers transform the param tree
        self.model_fn = model_fn
        self._apply = jax.jit(model_fn)

        # fused fast path: one dispatch for on-device normalisation + forward
        # + softmax/mask/argmax + confidence; crops cross the PCIe as uint8
        # and only (N, T) indices + (N,) confidences come back.
        def _norm(x):
            if x.dtype == jnp.uint8:
                # exact ToTensor + (v-0.5)/0.5 op order (utils.py:541-543)
                x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            return x.astype(self.compute_dtype)

        nc = converter.num_classes

        def _fused(params, x, keep_mask):
            logits = model_fn(params, _norm(x)).astype(jnp.float32)
            indices, values = postprocess_logits(logits, keep_mask)
            return pack_decode_payload(compact_indices(indices, nc),
                                       ctc_confidences(indices, values))

        self._apply_greedy = jax.jit(_fused)

        def _fused_ribbon(params, flat, meta, keep_mask, *, out_w, wire):
            from ocrfa_tpu.preproc.ribbon import ribbon_to_batch

            crops, _ = ribbon_to_batch(flat, meta, out_w=out_w, wire=wire)
            logits = model_fn(params, crops.astype(self.compute_dtype))
            indices, values = postprocess_logits(logits.astype(jnp.float32),
                                                 keep_mask)
            return pack_decode_payload(compact_indices(indices, nc),
                                       ctc_confidences(indices, values))

        self._apply_ribbon = jax.jit(_fused_ribbon,
                                     static_argnames=("out_w", "wire"))

        def _fused_probs(params, x, keep_mask):
            logits = model_fn(params, _norm(x)).astype(jnp.float32)
            return postprocess_logits(logits, keep_mask, return_probs=True)

        self._apply_probs = jax.jit(_fused_probs)

        def _fused_beam(params, x, keep_mask, trie_trans=None, trie_word=None,
                        trie_word_id=None, word_lm_log=None,
                        *, beam_width, sep_idx=-1, oov_penalty=-4.0,
                        word_bonus=0.0, word_lm_factor=0.5):
            from ocrfa_tpu.decode.beam_device import ctc_beam_search_device

            logits = model_fn(params, _norm(x)).astype(jnp.float32)
            indices, values, probs = postprocess_logits(logits, keep_mask,
                                                        return_probs=True)
            log_probs = jnp.log(jnp.maximum(probs, 1e-30))
            prefixes, lengths, scores = ctc_beam_search_device(
                log_probs, beam_width=beam_width,
                trie_trans=trie_trans, trie_word=trie_word, sep_idx=sep_idx,
                oov_penalty=oov_penalty, word_bonus=word_bonus,
                trie_word_id=trie_word_id, word_lm_log=word_lm_log,
                word_lm_factor=word_lm_factor,
            )
            return prefixes, lengths, scores, ctc_confidences(indices, values)

        # beam_width alone is static: the penalty/separator knobs trace as
        # scalars, so an OOV-penalty sweep reuses one compiled program
        self._apply_beam = jax.jit(_fused_beam, static_argnames=("beam_width",))

    def logits(self, batch: np.ndarray) -> jax.Array:
        """(N, H, W, 1) float32 crops -> (N, T, C) logits (f32)."""
        n = batch.shape[0]
        x = jnp.asarray(batch, self.compute_dtype)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        out = self._apply(self.params, x)
        return out[:n].astype(jnp.float32)

    def predict_async(self, batch: np.ndarray, keep_mask: np.ndarray):
        """Dispatch the fused greedy pass without blocking.

        Returns ``(payload_dev, n)`` — one packed device array (indices +
        bitcast confidences, see ``pack_decode_payload``) the caller
        materialises later.  Lets multiple buckets/chunks be in flight so
        host decode and PCIe/ICI latency overlap device compute.
        """
        n = batch.shape[0]
        nb = bucket_for_batch(n)
        if nb != n:
            pad = np.repeat(batch[-1:], nb - n, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        x = jnp.asarray(batch)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        payload = self._apply_greedy(self.params, x, jnp.asarray(keep_mask))
        return payload, n

    def predict_ribbon_async(self, crops, keep_mask, out_w: int,
                             img_h: int = 64, wire: str = "u8",
                             u1_threshold: int | None = None):
        """Dispatch native-resolution crops through the ribbon wire format.

        Crops cross the link as one packed byte ribbon (native size, 2-4x
        fewer bytes than padded batches; ``wire="u4"`` halves that again
        with 4-bit pixels); resize-to-bucket, forward and CTC postprocess
        run as one device program.  Returns the same handle shape as
        :meth:`predict_async`.  ``u1_threshold`` calibrates the u1
        binarisation cut (see :func:`ocrfa_tpu.preproc.ribbon.pack_crops`
        — u1 at the default cut costs thin towers real CER; qualify it).
        """
        from ocrfa_tpu.preproc.ribbon import pack_crops

        n = len(crops)
        flat, meta = pack_crops(crops, wire=wire, u1_threshold=u1_threshold)
        flat = jnp.asarray(flat)
        meta_dev = jnp.asarray(meta)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate, shard_batch

            flat = replicate(flat, self.mesh)
            meta_dev = shard_batch(meta, self.mesh)
        payload = self._apply_ribbon(
            self.params, flat, meta_dev, jnp.asarray(keep_mask),
            out_w=int(out_w), wire=wire,
        )
        return payload, n

    def collect(self, handle):
        """Materialise a ``predict_async`` handle into [[text, conf], ...].

        One ``np.asarray`` — one relay round trip — per handle; indices and
        confidences travel packed (``pack_decode_payload``)."""
        payload, n = handle
        indices, confs = unpack_decode_payload(np.asarray(payload)[:n])
        texts = decode_greedy_batch(
            indices, self.converter.character, self.converter.ignore_idx
        )
        return [[t, c] for t, c in zip(texts, confs.tolist())]

    def set_decode_defaults(self, **kwargs):
        """Set fusion defaults for :meth:`predict`: ``lexicon``,
        ``word_lm``, ``oov_penalty``, ``word_bonus``, ``word_lm_factor``,
        ``beam_width``.  Returns ``self`` (chainable at construction)."""
        allowed = {"lexicon", "word_lm", "oov_penalty", "word_bonus",
                   "word_lm_factor", "beam_width"}
        unknown = set(kwargs) - allowed
        if unknown:
            raise TypeError(f"unknown decode defaults: {sorted(unknown)}")
        self.decode_defaults.update(kwargs)
        return self

    def predict(self, batch: np.ndarray, keep_mask: np.ndarray,
                decoder: str = "greedy", beam_width=None,
                lexicon=None, oov_penalty=None,
                word_bonus=None, word_lm=None,
                word_lm_factor=None, return_beams: bool = False):
        """Run one padded batch end-to-end; returns [[text, conf], ...].

        ``return_beams=True`` (fast decoders only) instead returns every
        live beam per sample as best-first ``[(text, logprob), ...]`` — the
        input :meth:`~ocrfa_tpu.decode.lm.WordNGramLM.rescore` expects.

        Fusion arguments left at their defaults fall back to
        :meth:`set_decode_defaults`, so a facade caller that can only pass
        ``decoder=`` (the reference ``readtext`` kwarg surface) still gets
        the configured lexicon/LM.

        Decoders: ``greedy`` (on-device, reference-exact), ``beamsearch`` /
        ``wordbeamsearch`` (host, reference-exact), ``beamsearch_fast``
        (lax.scan beam fully on-device — better posterior argmax than the
        reference beam, not tie-exact with it), ``wordbeamsearch_fast``
        (device beam with dictionary-trie shallow fusion — pass ``lexicon``,
        a :class:`~ocrfa_tpu.decode.lexicon.LexiconTrie` over this
        converter's classes; ``oov_penalty``/``word_bonus`` tune it, and an
        optional ``word_lm`` — a :class:`~ocrfa_tpu.decode.lm.WordNGramLM`
        built over ``lexicon.words`` — scores each completed word in
        context, ``word_lm_factor * log P(word | previous word)``, inside
        the same device scan).
        """
        d = self.decode_defaults
        if beam_width is None:
            beam_width = d.get("beam_width", 5)
        if lexicon is None:
            lexicon = d.get("lexicon")
        if oov_penalty is None:
            oov_penalty = d.get("oov_penalty", -4.0)
        if word_bonus is None:
            word_bonus = d.get("word_bonus", 0.0)
        if word_lm is None:
            word_lm = d.get("word_lm")
        if word_lm_factor is None:
            word_lm_factor = d.get("word_lm_factor", 0.5)
        if return_beams and decoder not in ("beamsearch_fast",
                                            "wordbeamsearch_fast"):
            raise ValueError("return_beams needs a *_fast device decoder")
        if decoder == "greedy":
            return self.collect(self.predict_async(batch, keep_mask))

        n = batch.shape[0]
        # pad the batch dim to its bucket so compile count stays bounded
        nb = bucket_for_batch(n)
        if nb != n:
            pad = np.repeat(batch[-1:], nb - n, axis=0)
            batch = np.concatenate([batch, pad], axis=0)

        mask = jnp.asarray(keep_mask)
        x = jnp.asarray(batch)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)

        if decoder in ("beamsearch_fast", "wordbeamsearch_fast"):
            from ocrfa_tpu.decode.beam_device import (
                decode_all_beams_to_text, decode_beams_to_text)

            if decoder == "wordbeamsearch_fast":
                if lexicon is None:
                    raise ValueError(
                        "wordbeamsearch_fast needs a LexiconTrie (lexicon=)")
                chars = list(self.converter.character)
                sep = chars.index(" ") if " " in chars else -1
                wlm = {}
                if word_lm is not None:
                    if word_lm.vocab != lexicon.words:
                        raise ValueError(
                            "word_lm vocabulary must be the trie's word "
                            "list (build with WordNGramLM.fit(texts, "
                            "vocab=lexicon.words))")
                    wlm = dict(
                        trie_word_id=jnp.asarray(lexicon.word_id),
                        word_lm_log=jnp.asarray(word_lm.bigram_log_matrix()),
                        word_lm_factor=float(word_lm_factor),
                    )
                prefixes, lengths, scores, confs = self._apply_beam(
                    self.params, x, mask,
                    jnp.asarray(lexicon.trans), jnp.asarray(lexicon.is_word),
                    beam_width=beam_width, sep_idx=sep,
                    oov_penalty=float(oov_penalty),
                    word_bonus=float(word_bonus), **wlm,
                )
            else:
                prefixes, lengths, scores, confs = self._apply_beam(
                    self.params, x, mask, beam_width=beam_width
                )
            if return_beams:
                return decode_all_beams_to_text(
                    np.asarray(prefixes)[:n], np.asarray(lengths)[:n],
                    np.asarray(scores)[:n],
                    self.converter.character, self.converter.ignore_idx,
                )
            texts = decode_beams_to_text(
                np.asarray(prefixes)[:n], np.asarray(lengths)[:n],
                self.converter.character, self.converter.ignore_idx,
            )
            return [[t, c] for t, c in zip(texts, np.asarray(confs)[:n].tolist())]

        indices, values, probs = self._apply_probs(self.params, x, mask)
        indices = np.asarray(indices)[:n]
        values = np.asarray(values)[:n]
        probs = np.asarray(probs)[:n]
        if decoder == "beamsearch":
            texts = self.converter.decode_beamsearch(probs, beamWidth=beam_width)
        elif decoder == "wordbeamsearch":
            texts = self.converter.decode_wordbeamsearch(probs, beamWidth=beam_width)
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        confidences = greedy_confidences(indices, values)

        return [[t, c] for t, c in zip(texts, confidences)]


class TrocrRecognizer:
    """Facade-compatible recognizer over the TrOCR transformer family.

    Exposes the same driver surface as :class:`Recognizer`
    (``predict_async``/``collect``/``predict`` + ``.converter``), so a
    trained TrOCR injects straight into the production pipeline:
    ``ocr.recognizer = TrocrRecognizer(params, converter)`` and
    ``readtext``/``get_text``/``recognize_crops`` run unchanged — the
    transformer is first-class, not a side demo (BASELINE config 4).

    Decode is always the on-device KV-cached autoregressive greedy scan
    (``models.trocr.greedy_generate_scored``); beam decoders fall back to
    greedy (CTC-prefix beams don't apply to an autoregressive decoder).
    The allowlist/ignore surface maps onto decoder-token logit masking and
    confidence is the length-normalised geometric mean of chosen-token
    probabilities (the custom_mean analog).
    """

    def __init__(self, params, converter, heads: int = 8, max_len: int = 48,
                 compute_dtype=jnp.float32):
        from ocrfa_tpu.models.trocr import (EOS, NUM_SPECIAL,
                                            greedy_generate_scored)

        self.converter = converter
        self.params = params
        self.heads = heads
        self.max_len = max_len
        self.compute_dtype = compute_dtype
        self.mesh = None
        self.decode_defaults: dict = {}
        self.vocab = converter.num_classes - 1 + NUM_SPECIAL
        self._eos = EOS

        def _fused(params, x_u8, token_keep):
            x = ((x_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
                 ).astype(compute_dtype)
            tokens, _lengths, confs = greedy_generate_scored(
                params, x, token_keep, heads=heads, max_len=max_len)
            # one packed device payload -> one host round trip (tokens fit
            # u8: vocab = charset + 3 specials <= 188 for arabic_g1)
            return pack_decode_payload(
                compact_indices(tokens, self.vocab), confs)

        self._apply = jax.jit(_fused)

    def _token_keep(self, keep_mask):
        from ocrfa_tpu.models.trocr import token_keep_from_ctc_mask

        return jnp.asarray(token_keep_from_ctc_mask(keep_mask, self.vocab))

    def predict_async(self, batch: np.ndarray, keep_mask: np.ndarray):
        """Dispatch without blocking; returns a ``collect``-able handle."""
        n = batch.shape[0]
        x = jnp.asarray(batch)
        payload = self._apply(self.params, x, self._token_keep(keep_mask))
        return payload, n

    def collect(self, handle):
        from ocrfa_tpu.models.trocr import tokens_to_text

        payload, n = handle
        tokens, confs = unpack_decode_payload(np.asarray(payload)[:n])
        lengths = np.cumprod(tokens != self._eos, axis=1).sum(axis=1)
        texts = tokens_to_text(tokens, lengths, self.converter.character)
        return [[t, c] for t, c in zip(texts, confs.tolist())]

    def predict(self, batch, keep_mask, decoder: str = "greedy",
                beam_width: int = 5, **_kwargs):
        return self.collect(self.predict_async(batch, keep_mask))


def recognize_crops(recognizer: Recognizer, crops, keep_mask=None,
                    img_h: int = 64, ladder=None):
    """Width-bucketed batch recognition over raw grey crops (config 2).

    Crops are grouped by their aspect-preserved pad width onto the bucket
    ladder, each bucket runs as one pipelined device batch, and results
    scatter back to input order.  Returns [[text, confidence], ...].
    """
    from ocrfa_tpu.preproc.buckets import WIDTH_BUCKETS, bucketize

    if not crops:
        return []
    ladder = ladder or WIDTH_BUCKETS
    if keep_mask is None:
        keep_mask = keep_mask_for(recognizer.converter.num_classes,
                                  recognizer.converter.ignore_idx)

    import math

    widths = []
    for crop in crops:
        h, w = np.asarray(crop).shape[:2]
        ratio = w / h if w >= h else h / w
        widths.append(math.ceil(ratio) * img_h)

    groups = bucketize(widths, ladder)
    results = [None] * len(crops)
    handles = []
    for bucket_w, indices in groups.items():
        for start in range(0, len(indices), MAX_DEVICE_BATCH):
            chunk_idx = indices[start:start + MAX_DEVICE_BATCH]
            batch = align_collate_u8([crops[i] for i in chunk_idx], img_h, bucket_w)
            handles.append((chunk_idx, recognizer.predict_async(batch, keep_mask)))
    for chunk_idx, handle in handles:
        for i, res in zip(chunk_idx, recognizer.collect(handle)):
            results[i] = res
    return results


def recognizer_predict(recognizer: Recognizer, images, img_h: int, img_w: int,
                       ignore_idx, decoder: str = "greedy", beam_width: int = 5,
                       adjust_contrast: float = 0.0):
    """Preprocess + forward + decode a list of grey crops.

    ``img_w`` is the pad width (the reference's per-call ``max_width``);
    it is rounded up to the active bucket ladder.
    """
    img_w = bucket_for_width(img_w)
    keep_mask = keep_mask_for(recognizer.converter.num_classes, ignore_idx)

    if decoder == "greedy":
        # dispatch every chunk before collecting any: host preproc/decode
        # overlaps device compute across chunks
        handles = []
        for start in range(0, len(images), MAX_DEVICE_BATCH):
            chunk = images[start:start + MAX_DEVICE_BATCH]
            batch = align_collate_u8(chunk, img_h, img_w, adjust_contrast=adjust_contrast)
            handles.append(recognizer.predict_async(batch, keep_mask))
        results = []
        for handle in handles:
            results += recognizer.collect(handle)
        return results

    results = []
    for start in range(0, len(images), MAX_DEVICE_BATCH):
        chunk = images[start:start + MAX_DEVICE_BATCH]
        batch = align_collate_u8(chunk, img_h, img_w, adjust_contrast=adjust_contrast)
        results += recognizer.predict(batch, keep_mask, decoder, beam_width)
    return results


def get_text(character, img_h: int, img_w: int, recognizer: Recognizer,
             image_list, ignore_char: str = "", decoder: str = "greedy",
             beam_width: int = 5, batch_size: int = 1, contrast_ths: float = 0.1,
             adjust_contrast: float = 0.5, filter_ths: float = 0.003,
             workers: int = 0):
    """Full recognition driver with the contrast retry pass
    (get_text parity, utils.py:698-770).

    ``batch_size``/``workers`` are accepted for API compatibility; batching
    is handled by the bucket scheduler (all crops of a call run in one
    device batch, chunked at ``MAX_DEVICE_BATCH``).
    """
    ignore_idx = []
    for char in ignore_char:
        try:
            ignore_idx.append(character.index(char) + 1)
        except ValueError:
            pass

    coords = [item[0] for item in image_list]
    img_list = [item[1] for item in image_list]
    if not img_list:
        return []

    result1 = recognizer_predict(
        recognizer, img_list, img_h, img_w, ignore_idx, decoder, beam_width
    )

    # second pass with contrast stretch for low-confidence crops
    low_confident_idx = [i for i, item in enumerate(result1) if item[1] < contrast_ths]
    if low_confident_idx:
        img_list2 = [img_list[i] for i in low_confident_idx]
        result2 = recognizer_predict(
            recognizer, img_list2, img_h, img_w, ignore_idx, decoder, beam_width,
            adjust_contrast=adjust_contrast,
        )

    result = []
    for i, (box, pred1) in enumerate(zip(coords, result1)):
        if i in low_confident_idx:
            pred2 = result2[low_confident_idx.index(i)]
            best = pred1 if pred1[1] > pred2[1] else pred2
            result.append((box, best[0], best[1]))
        else:
            result.append((box, pred1[0], pred1[1]))
    return result
