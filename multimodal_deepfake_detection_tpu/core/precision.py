"""Mixed-precision policy for TPU execution.

The PyTorch reference runs CUDA AMP (``torch.amp.autocast`` +
``GradScaler`` — ``/root/reference/train_visual.py:535``) with fp32 master
weights. The TPU-native equivalent is bf16 compute with fp32 parameters and
fp32 batch-norm statistics; bf16 has the same exponent range as fp32, so no
loss-scaling machinery is needed (GradScaler has no TPU analog on purpose).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype each class of tensor uses.

    * ``param_dtype`` — storage dtype of the master parameters.
    * ``compute_dtype`` — dtype activations/weights are cast to inside matmuls
      and convolutions (bf16 feeds the MXU at 2x the fp32 rate).
    * ``norm_dtype`` — dtype for batch-norm statistics / normalization math.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return cast_tree(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return cast_tree(tree, self.param_dtype)


def at_least_f32(x):
    """Upcast to AT LEAST fp32 (bf16/f16 -> f32; f32 -> f32; f64 stays f64).

    Precision-sensitive math (BN statistics, ArcFace acos, log-softmax) is
    written against this instead of a hard ``astype(float32)`` so the whole
    stack runs faithfully under ``jax.experimental.enable_x64`` — the fp64
    mode the torch-gradient-parity oracle uses (tests/test_train_step_parity.py).
    Identical behavior in production (x64 disabled: no fp64 arrays exist).
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def cast_tree(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``."""

    def _cast(x):
        if isinstance(x, (jnp.ndarray, jax.Array)) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


DEFAULT_POLICY = Policy()
# bf16 compute, fp32 params/norms: the standard TPU training policy.
TPU_POLICY = Policy(compute_dtype=jnp.bfloat16)
