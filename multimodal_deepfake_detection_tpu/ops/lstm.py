"""LSTM as a `lax.scan` — the TPU-native replacement for cuDNN LSTM.

The reference leans on ``nn.LSTM`` (``/root/reference/XceptionLSTMV.py:18-23``,
``XceptionLSTMA.py:14-19``) and on a bidirectional variant inside the AU-patch
model (``/root/reference/test_au_patch.py:287-289``). On TPU the right shape of
this computation is:

1. hoist the input projection out of the recurrence: one big
   ``(B*T, D) @ (D, 4H)`` matmul that XLA tiles onto the MXU,
2. ``lax.scan`` over time for the (small) recurrent ``(B, H) @ (H, 4H)``
   matmul + elementwise gate math, which XLA fuses into a single loop body.

Gate order is torch's (i, f, g, o) and init is U(-1/sqrt(H), 1/sqrt(H)) so
ported checkpoints are bit-compatible at fp32.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Params = dict


def lstm_init(rng, input_size: int, hidden_size: int, *, dtype=jnp.float32) -> Params:
    """Single-layer LSTM parameters (torch layout, pre-transposed for matmul)."""
    bound = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (input_size, 4 * hidden_size)),
        "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def _cell_scan(params: Params, x_proj: jnp.ndarray, h0, c0, reverse: bool, compute_dtype):
    """Scan the recurrence over the time axis of ``x_proj`` (B, T, 4H)."""
    hidden = params["w_hh"].shape[0]
    w_hh = params["w_hh"]
    if compute_dtype is not None:
        w_hh = w_hh.astype(compute_dtype)
        x_proj = x_proj.astype(compute_dtype)
        h0 = h0.astype(compute_dtype)
        c0 = c0.astype(compute_dtype)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h, w_hh, preferred_element_type=xp_t.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) — scan over leading axis
    (h_T, c_T), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (h_T, c_T)


def lstm_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    compute_dtype=None,
    reverse: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the LSTM over (B, T, D); returns (outputs (B, T, H), (h_T, c_T))."""
    B, T, _ = x.shape
    hidden = params["w_hh"].shape[0]
    w_ih = params["w_ih"]
    bias = params["b_ih"] + params["b_hh"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_ih = w_ih.astype(compute_dtype)
    # One large MXU matmul for every timestep's input projection.
    x_proj = jnp.dot(x.reshape(B * T, -1), w_ih, preferred_element_type=x.dtype)
    x_proj = (x_proj + bias.astype(x_proj.dtype)).reshape(B, T, 4 * hidden)
    h0 = jnp.zeros((B, hidden), x_proj.dtype)
    c0 = jnp.zeros((B, hidden), x_proj.dtype)
    return _cell_scan(params, x_proj, h0, c0, reverse, compute_dtype)


def bilstm_init(rng, input_size: int, hidden_size: int, *, dtype=jnp.float32) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "fwd": lstm_init(r1, input_size, hidden_size, dtype=dtype),
        "bwd": lstm_init(r2, input_size, hidden_size, dtype=dtype),
    }


def bilstm_apply(params: Params, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    """Bidirectional LSTM; returns concatenated outputs (B, T, 2H)."""
    out_f, _ = lstm_apply(params["fwd"], x, compute_dtype=compute_dtype)
    out_b, _ = lstm_apply(params["bwd"], x, compute_dtype=compute_dtype, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)


def select_last_step(
    outputs: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pick the per-sequence final LSTM output.

    ``lengths=None`` reproduces the reference's ``lstm_out[:, -1]`` — which on
    zero-padded batches reads the *padded* tail
    (``/root/reference/XceptionLSTMV.py:68`` + ``video_dataloader.py:59-64``).
    Passing true lengths selects the last *valid* step instead (quality mode).
    """
    if lengths is None:
        return outputs[:, -1, :]
    idx = jnp.clip(lengths - 1, 0, outputs.shape[1] - 1)
    return jnp.take_along_axis(outputs, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
