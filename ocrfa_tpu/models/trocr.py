"""TrOCR-style transformer encoder-decoder line recognizer.

The reference has no attention model anywhere (SURVEY.md §5.7); this is the
BASELINE.json config-4 recognizer: a ViT-style encoder over the line crop
and an autoregressive transformer decoder with on-device greedy decode
(KV-cached ``lax.scan`` — no Python loop, no host round-trips).

Sizing defaults target v5e MXU shapes (d_model multiple of 128, bf16).

Token space: CTC charset indices shifted by special tokens —
0 = PAD, 1 = BOS, 2 = EOS, characters start at 3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PAD, BOS, EOS = 0, 1, 2
NUM_SPECIAL = 3


# ---------------------------------------------------------------------------
# primitives


def _layer_norm(p, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(q, k, v, mask=None):
    """q: (..., Tq, H, Dh); k/v: (..., Tk, H, Dh)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _mha(p, x_q, x_kv, heads: int, mask=None):
    d = x_q.shape[-1]
    dh = d // heads

    def proj(w, x):
        return (x @ w).reshape(*x.shape[:-1], heads, dh)

    q = proj(p["wq"], x_q)
    k = proj(p["wk"], x_kv)
    v = proj(p["wv"], x_kv)
    o = _attention(q, k, v, mask)
    return o.reshape(*x_q.shape[:-1], d) @ p["wo"]


def _mlp(p, x):
    return jax.nn.gelu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


# ---------------------------------------------------------------------------
# encoder


def encode(params, images, heads: int):
    """(N, H, W, 1) crops -> (N, T, D) memory.

    Patch embedding is a strided conv (full-height columns x 4-px strips ->
    one token per 4 px of width), followed by pre-LN transformer blocks.
    """
    p = params["encoder"]
    x = jax.lax.conv_general_dilated(
        images, p["patch"]["w"],
        window_strides=(p["patch"]["w"].shape[0], p["patch"]["w"].shape[1]),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch"]["b"]
    n, ph, pw, d = x.shape
    x = x.reshape(n, ph * pw, d)
    x = x + p["pos"][: x.shape[1]]

    for blk in p["blocks"]:
        h = _mha(blk["attn"], _layer_norm(blk["ln1"], x), _layer_norm(blk["ln1"], x), heads)
        x = x + h
        x = x + _mlp(blk["mlp"], _layer_norm(blk["ln2"], x))
    return _layer_norm(p["ln_f"], x)


# ---------------------------------------------------------------------------
# decoder


def _decoder_block(blk, x, memory, heads: int, self_mask, cache=None, idx=None,
                   cross_kv=None):
    """One pre-LN decoder block; with ``cache`` given, runs a single
    incremental step writing K/V at position ``idx``.  ``cross_kv`` supplies
    precomputed encoder K/V (computed once per sequence, not per step)."""
    y = _layer_norm(blk["ln1"], x)
    d = y.shape[-1]
    dh = d // heads

    def proj(w, v):
        return (v @ w).reshape(*v.shape[:-1], heads, dh)

    q = proj(blk["self"]["wq"], y)
    k = proj(blk["self"]["wk"], y)
    v = proj(blk["self"]["wv"], y)
    if cache is not None:
        k_cache = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, idx, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, idx, axis=1)
        valid = (jnp.arange(k_cache.shape[1]) <= idx)[None, None, None, :]
        o = _attention(q, k_cache, v_cache, valid)
        new_cache = {"k": k_cache, "v": v_cache}
    else:
        o = _attention(q, k, v, self_mask)
        new_cache = None
    x = x + o.reshape(*y.shape[:-1], d) @ blk["self"]["wo"]

    yc = _layer_norm(blk["ln2"], x)
    if cross_kv is not None:
        qc = proj(blk["cross"]["wq"], yc)
        oc = _attention(qc, cross_kv["k"], cross_kv["v"])
        x = x + oc.reshape(*yc.shape[:-1], d) @ blk["cross"]["wo"]
    else:
        x = x + _mha(blk["cross"], yc, memory, heads)
    x = x + _mlp(blk["mlp"], _layer_norm(blk["ln3"], x))
    return x, new_cache


def decode_logits(params, memory, tokens, heads: int):
    """Teacher-forced decoder: (N, L) tokens -> (N, L, V) logits."""
    p = params["decoder"]
    n, l = tokens.shape
    x = p["embed"][tokens] + p["pos"][:l]
    causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
    for blk in p["blocks"]:
        x, _ = _decoder_block(blk, x, memory, heads, causal)
    x = _layer_norm(p["ln_f"], x)
    return x @ p["out"]["w"] + p["out"]["b"]


def trocr_apply(params, images, tokens, heads: int = 8):
    """Training forward: images + teacher-forced tokens -> logits."""
    memory = encode(params, images, heads)
    return decode_logits(params, memory, tokens, heads)


@partial(jax.jit, static_argnames=("heads", "max_len"))
def greedy_generate(params, images, heads: int = 8, max_len: int = 64):
    """Autoregressive greedy decode fully on-device (lax.scan + KV cache).

    Returns (N, max_len) token ids (EOS-padded) and (N,) lengths.
    """
    memory = encode(params, images, heads)
    p = params["decoder"]
    n = images.shape[0]
    d = p["embed"].shape[1]
    n_heads = heads
    dh = d // n_heads
    n_blocks = len(p["blocks"])

    caches = [
        {
            "k": jnp.zeros((n, max_len, n_heads, dh), memory.dtype),
            "v": jnp.zeros((n, max_len, n_heads, dh), memory.dtype),
        }
        for _ in range(n_blocks)
    ]
    # encoder K/V once per sequence (cross-attention never changes per step)
    cross_kvs = [
        {
            "k": (memory @ blk["cross"]["wk"]).reshape(n, -1, n_heads, dh),
            "v": (memory @ blk["cross"]["wv"]).reshape(n, -1, n_heads, dh),
        }
        for blk in p["blocks"]
    ]

    def step(carry, idx):
        token, done, caches = carry
        x = p["embed"][token][:, None, :] + p["pos"][idx][None, None, :]
        new_caches = []
        for blk, cache, cross_kv in zip(p["blocks"], caches, cross_kvs):
            x, cache = _decoder_block(blk, x, memory, n_heads, None,
                                      cache=cache, idx=idx, cross_kv=cross_kv)
            new_caches.append(cache)
        x = _layer_norm(p["ln_f"], x)
        logits = x[:, 0] @ p["out"]["w"] + p["out"]["b"]
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(done, EOS, next_token)
        done = done | (next_token == EOS)
        return (next_token, done, new_caches), next_token

    init = (jnp.full((n,), BOS, jnp.int32), jnp.zeros((n,), bool), caches)
    _, tokens = jax.lax.scan(step, init, jnp.arange(max_len))
    tokens = jnp.swapaxes(tokens, 0, 1)  # (N, max_len)
    lengths = jnp.sum(jnp.cumprod((tokens != EOS).astype(jnp.int32), axis=1), axis=1)
    return tokens, lengths


@partial(jax.jit, static_argnames=("heads", "max_len"))
def greedy_generate_scored(params, images, token_keep, heads: int = 8,
                           max_len: int = 64):
    """:func:`greedy_generate` + logit masking + sequence confidence.

    ``token_keep`` is a ``(vocab,)`` 0/1 float mask over DECODER tokens
    (see :func:`token_keep_from_ctc_mask` for the CTC-class mapping): the
    pipeline's allowlist/ignore_char surface applied autoregressively.
    Returns ``(tokens (N, max_len) EOS-padded, lengths (N,), confs (N,))``
    where conf is the length-normalised geometric mean of the chosen-token
    softmax probabilities over emitted steps — the transformer analog of
    the CTC path's custom_mean confidence.
    """
    memory = encode(params, images, heads)
    p = params["decoder"]
    n = images.shape[0]
    d = p["embed"].shape[1]
    n_heads = heads
    dh = d // n_heads
    n_blocks = len(p["blocks"])
    neg = jnp.asarray(-1e30, memory.dtype)

    caches = [
        {
            "k": jnp.zeros((n, max_len, n_heads, dh), memory.dtype),
            "v": jnp.zeros((n, max_len, n_heads, dh), memory.dtype),
        }
        for _ in range(n_blocks)
    ]
    cross_kvs = [
        {
            "k": (memory @ blk["cross"]["wk"]).reshape(n, -1, n_heads, dh),
            "v": (memory @ blk["cross"]["wv"]).reshape(n, -1, n_heads, dh),
        }
        for blk in p["blocks"]
    ]

    def step(carry, idx):
        token, done, caches, logp_sum, count = carry
        x = p["embed"][token][:, None, :] + p["pos"][idx][None, None, :]
        new_caches = []
        for blk, cache, cross_kv in zip(p["blocks"], caches, cross_kvs):
            x, cache = _decoder_block(blk, x, memory, n_heads, None,
                                      cache=cache, idx=idx, cross_kv=cross_kv)
            new_caches.append(cache)
        x = _layer_norm(p["ln_f"], x)
        logits = x[:, 0] @ p["out"]["w"] + p["out"]["b"]
        logits = jnp.where(token_keep > 0, logits, neg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        step_logp = jnp.take_along_axis(
            logp, next_token[:, None], axis=-1)[:, 0]
        logp_sum = logp_sum + jnp.where(done, 0.0, step_logp)
        count = count + jnp.where(done, 0, 1)
        next_token = jnp.where(done, EOS, next_token)
        done = done | (next_token == EOS)
        return (next_token, done, new_caches, logp_sum, count), next_token

    init = (jnp.full((n,), BOS, jnp.int32), jnp.zeros((n,), bool), caches,
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32))
    (_, _, _, logp_sum, count), tokens = jax.lax.scan(
        step, init, jnp.arange(max_len))
    tokens = jnp.swapaxes(tokens, 0, 1)
    lengths = jnp.sum(
        jnp.cumprod((tokens != EOS).astype(jnp.int32), axis=1), axis=1)
    confs = jnp.exp(logp_sum / jnp.maximum(count, 1))
    return tokens, lengths, confs


def token_keep_from_ctc_mask(keep_mask, vocab: int):
    """Map a CTC-class keep mask (0 = blank, c = charset index c-1) onto
    the decoder token space (``tokens_to_text``: token t -> character
    ``[t - NUM_SPECIAL + 1]``).  PAD/BOS are never emitted; EOS always is.
    """
    import numpy as np

    keep_mask = np.asarray(keep_mask, np.float32)
    out = np.zeros((vocab,), np.float32)
    out[EOS] = 1.0
    n_chars = min(vocab - NUM_SPECIAL, keep_mask.shape[0] - 1)
    out[NUM_SPECIAL:NUM_SPECIAL + n_chars] = keep_mask[1:1 + n_chars]
    return out


def tokens_to_text(tokens, lengths, character):
    """Decoder tokens -> strings (charset indices start at NUM_SPECIAL)."""
    import numpy as np

    texts = []
    for row, n in zip(np.asarray(tokens), np.asarray(lengths)):
        ids = row[: int(n)]
        texts.append(
            "".join(character[i - NUM_SPECIAL + 1] for i in ids if i >= NUM_SPECIAL)
        )
    return texts


def trocr_loss(params, images, tokens_in, tokens_out, heads: int = 8):
    """Teacher-forced cross entropy; PAD positions are masked out."""
    logits = trocr_apply(params, images, tokens_in, heads).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens_out[..., None], axis=-1)[..., 0]
    mask = (tokens_out != PAD).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# init


def init_trocr(rng, num_class: int, d_model: int = 256, heads: int = 8,
               enc_layers: int = 6, dec_layers: int = 4, mlp_ratio: int = 4,
               patch_h: int = 64, patch_w: int = 4, max_src: int = 1024,
               max_tgt: int = 128):
    """Random TrOCR params.  ``num_class`` counts charset entries + blank
    (CTC convention); the decoder vocabulary adds PAD/BOS/EOS."""
    vocab = num_class - 1 + NUM_SPECIAL  # drop blank, add specials
    keys = iter(jax.random.split(rng, 16 + 8 * (enc_layers + dec_layers)))

    def dense(cin, cout, scale=None):
        scale = scale or (cin ** -0.5)
        return scale * jax.random.normal(next(keys), (cin, cout))

    def ln():
        return {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))}

    def attn():
        return {
            "wq": dense(d_model, d_model),
            "wk": dense(d_model, d_model),
            "wv": dense(d_model, d_model),
            "wo": dense(d_model, d_model),
        }

    def mlp():
        return {
            "w1": dense(d_model, d_model * mlp_ratio),
            "b1": jnp.zeros((d_model * mlp_ratio,)),
            "w2": dense(d_model * mlp_ratio, d_model),
            "b2": jnp.zeros((d_model,)),
        }

    encoder = {
        "patch": {
            "w": 0.02 * jax.random.normal(next(keys), (patch_h, patch_w, 1, d_model)),
            "b": jnp.zeros((d_model,)),
        },
        "pos": 0.02 * jax.random.normal(next(keys), (max_src, d_model)),
        "blocks": [
            {"ln1": ln(), "attn": attn(), "ln2": ln(), "mlp": mlp()}
            for _ in range(enc_layers)
        ],
        "ln_f": ln(),
    }
    decoder = {
        "embed": 0.02 * jax.random.normal(next(keys), (vocab, d_model)),
        "pos": 0.02 * jax.random.normal(next(keys), (max_tgt, d_model)),
        "blocks": [
            {"ln1": ln(), "self": attn(), "ln2": ln(), "cross": attn(),
             "ln3": ln(), "mlp": mlp()}
            for _ in range(dec_layers)
        ],
        "ln_f": ln(),
        "out": {"w": dense(d_model, vocab), "b": jnp.zeros((vocab,))},
    }
    return {"encoder": encoder, "decoder": decoder}
