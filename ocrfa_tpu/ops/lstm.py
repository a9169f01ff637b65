"""Bidirectional LSTM for CTC sequence heads, designed for the TPU MXU.

Replaces the reference's cuDNN ``nn.LSTM`` (``modules/blocks.py:85-102``)
with a JAX implementation that keeps the FLOPs on the MXU:

* The input projection ``x_t @ W_ih^T + b`` for *all* timesteps is hoisted
  out of the recurrence into one large ``(N*T, In) x (In, 4H)`` matmul.
* Only the hidden-state projection runs inside ``lax.scan`` — an
  ``(N, H) x (H, 4H)`` matmul per step, which XLA keeps resident in VMEM.

Weight layout follows torch (gate order i, f, g, o; ``w_ih: (4H, In)``,
``w_hh: (4H, H)``) so converted reference checkpoints drop in unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lstm_scan(x_proj, w_hh_t, h0, c0, reverse: bool = False):
    """Run the LSTM recurrence over ``x_proj`` of shape (T, N, 4H).

    ``w_hh_t`` is the transposed hidden projection ``(H, 4H)``.
    Returns the stacked hidden states ``(T, N, H)``.
    """
    hidden = h0.shape[-1]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh_t
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), x_proj, reverse=reverse)
    return hs


def lstm(x, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """Unidirectional LSTM over ``x`` of shape (N, T, In) -> (N, T, H)."""
    n = x.shape[0]
    hidden = w_hh.shape[1]
    # one big MXU matmul for all timesteps
    x_proj = x @ w_ih.T + (b_ih + b_hh)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, N, 4H)

    h0 = jnp.zeros((n, hidden), dtype=x.dtype)
    c0 = jnp.zeros((n, hidden), dtype=x.dtype)
    hs = _lstm_scan(x_proj, w_hh.T, h0, c0, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def bilstm(x, params) -> jnp.ndarray:
    """Bidirectional LSTM + linear projection (BidirectionalLSTM parity,
    ``modules/blocks.py:85-102``).

    ``params`` keys: ``w_ih``, ``w_hh``, ``b_ih``, ``b_hh`` and their
    ``*_rev`` twins, plus ``linear_w`` ``(Out, 2H)`` and ``linear_b``.
    Output: (N, T, Out).
    """
    fwd = lstm(x, params["w_ih"], params["w_hh"], params["b_ih"], params["b_hh"])
    bwd = lstm(
        x,
        params["w_ih_rev"],
        params["w_hh_rev"],
        params["b_ih_rev"],
        params["b_hh_rev"],
        reverse=True,
    )
    h = jnp.concatenate([fwd, bwd], axis=-1)
    return h @ params["linear_w"].T + params["linear_b"]
