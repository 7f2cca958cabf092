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


def _cell_scan(params: Params, x_proj: jnp.ndarray, h0, c0, reverse: bool, compute_dtype,
               valid_T=None):
    """Scan the recurrence over the time axis of ``x_proj`` (B, T, 4H).

    ``valid_T`` (scalar or per-sample ``(B,)``, static or traced) gates the
    carry update: steps with ``t >= valid_T`` pass the state through
    unchanged. A *reverse* scan over a bucket padded past the batch max length
    would otherwise consume the extra pad rows *first* and corrupt the state
    for every real step; with the gate, the state stays at init until the scan
    reaches ``valid_T - 1``, which is bit-identical to the reference's
    pad-to-batch-max biLSTM (``/root/reference/test_au_patch.py:287-289`` +
    ``video_dataloader.py:59-64``). A per-sample ``valid_T`` makes padding
    fully inert row by row (quality mode / bucketed serving).
    """
    hidden = params["w_hh"].shape[0]
    w_hh = params["w_hh"]
    if compute_dtype is not None:
        w_hh = w_hh.astype(compute_dtype)
        x_proj = x_proj.astype(compute_dtype)
        h0 = h0.astype(compute_dtype)
        c0 = c0.astype(compute_dtype)

    def step(carry, inp):
        xp_t, t = inp
        h, c = carry
        gates = xp_t + jnp.dot(h, w_hh, preferred_element_type=xp_t.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if valid_T is not None:
            keep = t < valid_T  # scalar, or (B,) for per-sample gating
            if getattr(keep, "ndim", 0):
                keep = keep[:, None]
            h_new = jnp.where(keep, h_new, h)
            c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    T = x_proj.shape[1]
    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.arange(T))  # scan over leading axis
    (h_T, c_T), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1), (h_T, c_T)


def lstm_apply(
    params: Params,
    x: jnp.ndarray,
    *,
    compute_dtype=None,
    reverse: bool = False,
    valid_T=None,
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
    return _cell_scan(params, x_proj, h0, c0, reverse, compute_dtype, valid_T)


def bilstm_init(rng, input_size: int, hidden_size: int, *, dtype=jnp.float32) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "fwd": lstm_init(r1, input_size, hidden_size, dtype=dtype),
        "bwd": lstm_init(r2, input_size, hidden_size, dtype=dtype),
    }


def bilstm_apply(params: Params, x: jnp.ndarray, *, compute_dtype=None, valid_T=None) -> jnp.ndarray:
    """Bidirectional LSTM; returns concatenated outputs (B, T, 2H).

    ``valid_T`` makes the backward pass start from step ``valid_T - 1``
    instead of the (possibly bucket-padded) array end — see ``_cell_scan``.
    """
    out_f, _ = lstm_apply(params["fwd"], x, compute_dtype=compute_dtype)
    out_b, _ = lstm_apply(params["bwd"], x, compute_dtype=compute_dtype, reverse=True,
                          valid_T=valid_T)
    return jnp.concatenate([out_f, out_b], axis=-1)


def select_last_step(
    outputs: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    *,
    mask_padding: bool = True,
) -> jnp.ndarray:
    """Pick the per-sequence final LSTM output.

    Three behaviors:

    * ``lengths`` given, ``mask_padding=True`` (quality mode, the default in
      every CLI): each sample's last *valid* step.
    * ``lengths`` given, ``mask_padding=False`` (fidelity mode): the step at
      the **batch max length** for every sample. The reference zero-pads each
      batch to its own max length and reads ``lstm_out[:, -1]``
      (``/root/reference/XceptionLSTMV.py:68`` + ``video_dataloader.py:59-64``),
      i.e. short samples' LSTMs consume pad frames up to the batch max. Under
      bucketed collate (``data/collate.py``) the time axis is padded *past*
      the batch max to a static bucket boundary, so ``outputs[:, -1]`` would
      over-run; scan outputs at step t depend only on inputs <= t, so indexing
      at ``max(lengths) - 1`` is bit-identical to the reference's pad-to-max
      behavior regardless of the bucket size.
    * ``lengths=None``: raw ``outputs[:, -1]`` (exact only when the padded
      width equals the batch max length).
    """
    if lengths is None:
        return outputs[:, -1, :]
    if mask_padding:
        idx = jnp.clip(lengths - 1, 0, outputs.shape[1] - 1)
    else:
        idx = jnp.broadcast_to(
            jnp.clip(jnp.max(lengths) - 1, 0, outputs.shape[1] - 1), lengths.shape
        )
    return jnp.take_along_axis(outputs, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
