"""Explicit MXU contract precision for Pallas-kernel dots.

jax dots inherit the ambient ``jax_default_matmul_precision`` when no
explicit ``precision`` is passed (``None`` also means "inherit", NOT
"default"). The test conftest pins the ambient to ``"highest"`` for
CPU-vs-oracle determinism, but Mosaic rejects ``contract_precision<fp32>``
on non-f32 operands ("Bad lhs type" at kernel lowering) — and for
bf16/int8 operands "highest" is semantically empty anyway: the MXU
multiplies them exactly into the f32 accumulator, so there is no
higher-precision pass to request. Every kernel dot therefore pins
``Precision.DEFAULT`` when its operands are not f32 and keeps the ambient
setting for f32 ones, making the kernels lower identically under ANY
ambient precision. Found by the round-5 on-hardware suite run: 8 kernel
tests failed only under the test harness's ambient setting while every
production surface (bench, serving, training) compiled fine — a
half-fix from earlier (``else None`` at the tournament dots) still
inherited the ambient and did not survive the harness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def contract_precision(dtype) -> jax.lax.Precision | None:
    """Precision for a kernel dot whose operands are ``dtype``:
    ``None`` (ambient) for f32, ``Precision.DEFAULT`` otherwise."""
    if jnp.dtype(dtype) == jnp.float32:
        return None
    return jax.lax.Precision.DEFAULT
