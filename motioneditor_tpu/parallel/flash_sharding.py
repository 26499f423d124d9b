"""Frame-sharded execution of the Pallas attention kernels (shard_map).

GSPMD cannot partition a ``pallas_call`` — under a sharded mesh XLA
all-gathers the operands and runs the whole kernel replicated on every
device. This module makes the hot kernels execute on their LOCAL frame
shards instead: each attention op is wrapped in ``jax.shard_map`` over the
``frames`` mesh axis, the cross-device K/V sources of the reference's
attention variants are built with explicit collectives, and the kernels run
on identity-mapped explicit K/V (ops/video_flash.py kv variants):

  normal         no communication (frame-local)
  sparse_causal  K/V = [frame 0 | prev]: frame 0 broadcast (all-gather of
                 one frame) + 1-frame halo (ppermute), fully_control's
                 select semantics (attention_2d.py:573-580)
  motion_frame   K/V = [prev | cur]: 1-frame ppermute halo
                 (attention_2d.py:732-740)
  dense          K/V = all frames: all-gather over ``frames``
                 (attention_2d.py:651-657)
  temporal       all-gather K/V + causal mask at GLOBAL frame indices
                 (attention_2d.py:535-544)
  injection      fg/bg mask K/V decomposition on the halo-built source
                 (fully_control.py:372-422); the branch pairing
                 (edit_u<-recon_u, edit_c<-recon_c) is row-aligned so a
                 batch-sharded branch axis stays local

The reference's equivalent is xformers attention running unchanged under
accelerate DDP (inference.py:164-168, README.md:94) — there the frame axis
is never sharded; here it is the headline scaling axis (SURVEY §2.8).

``FrameShardingCtx`` is a hashable static config threaded through
``unet_apply(..., shard_ctx=...)`` so jit caches can never mix sharded and
unsharded traces.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from motioneditor_tpu.parallel.mesh import DATA_AXIS, FRAME_AXIS


@dataclasses.dataclass(frozen=True)
class FrameShardingCtx:
    """Static description of the frame-sharded attention execution.

    ``mesh``: the device mesh (hashable — usable as a jit static arg).
    ``frame_axis``: mesh axis sharding the frame dimension.
    ``batch_axis``: mesh axis sharding the leading batch/branch dimension,
    or None to keep it replicated inside the kernel wrappers.
    ``model_axis``: optional tensor-parallel axis (parallel/tp.py). When set
    and the head count divides, the kernel wrappers ALSO map the channel
    axis over it — attention is embarrassingly parallel over heads, and the
    Megatron column layout makes contiguous channel blocks = contiguous head
    blocks, so each model shard runs its own heads through the local kernel
    with no communication (this removes the all-gather GSPMD would insert
    at the pallas_call boundary, the round-4 TP x flash serialization).
    """

    mesh: Mesh
    frame_axis: str = FRAME_AXIS
    batch_axis: Optional[str] = DATA_AXIS
    model_axis: Optional[str] = None

    @property
    def fp(self) -> int:
        return self.mesh.shape[self.frame_axis]

    @property
    def tp(self) -> int:
        return self.mesh.shape.get(self.model_axis, 1) if self.model_axis else 1

    def batch_size(self) -> int:
        return self.mesh.shape.get(self.batch_axis, 1) if self.batch_axis else 1

    def head_shards(self, heads: int, c: int) -> int:
        """How many ways the head axis splits over ``model`` for this site
        (1 = replicated channels, the pre-round-5 behavior)."""
        tp = self.tp
        if tp > 1 and heads % tp == 0 and c % heads == 0:
            return tp
        return 1

    def token_spec(self, b: int, head_sharded: bool = False) -> P:
        """PartitionSpec for a [B, F, N, C] token tensor."""
        ba = self.batch_axis if (self.batch_axis and b % self.batch_size() == 0
                                 and self.batch_size() > 1) else None
        ca = self.model_axis if head_sharded else None
        return P(ba, self.frame_axis, None, ca)

    def supports(self, f: int, n: int) -> bool:
        """Frame axis divisible and at least one frame per shard."""
        return f % self.fp == 0 and f >= self.fp


def for_mesh(mesh: Optional[Mesh]) -> Optional[FrameShardingCtx]:
    """Ctx for a mesh, or None when the mesh doesn't shard frames."""
    if mesh is None or FRAME_AXIS not in mesh.shape or mesh.shape[FRAME_AXIS] == 1:
        return None
    ba = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None
    from motioneditor_tpu.parallel.mesh import MODEL_AXIS

    ma = MODEL_AXIS if mesh.shape.get(MODEL_AXIS, 1) > 1 else None
    return FrameShardingCtx(mesh=mesh, batch_axis=ba, model_axis=ma)


# ---------------------------------------------------------------------------
# collective K/V builders (run inside shard_map; x is the LOCAL shard)
# ---------------------------------------------------------------------------


def _prev_frames(x: jnp.ndarray, axis: str, fp: int) -> jnp.ndarray:
    """prev[f] = global frame f-1 (f=0 -> frame 0): shift the local block
    right by one frame, receiving the previous shard's last frame over a
    1-frame ppermute halo."""
    if fp == 1:
        head = x[:, :1]
        return jnp.concatenate([head, x[:, :-1]], axis=1)
    recv = jax.lax.ppermute(
        x[:, -1:], axis, [(i, i + 1) for i in range(fp - 1)]
    )
    idx = jax.lax.axis_index(axis)
    # global frame 0's "previous" is itself (the reference's former[0]=0)
    head = jnp.where(idx == 0, x[:, :1], recv)
    return jnp.concatenate([head, x[:, :-1]], axis=1)


def _first_frame(x: jnp.ndarray, axis: str, fp: int) -> jnp.ndarray:
    """[B, 1, N, C] global frame 0, visible on every frame shard."""
    if fp == 1:
        return x[:, :1]
    g = jax.lax.all_gather(x[:, 0], axis)  # [fp, B, N, C]
    return jnp.swapaxes(g[:1], 0, 1)  # [B, 1, N, C]


def _all_frames(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """[B, F_global, N, C] all-gather of the frame axis."""
    return jax.lax.all_gather(x, axis, axis=1, tiled=True)


# ---------------------------------------------------------------------------
# sharded kernel wrappers
# ---------------------------------------------------------------------------


def sharded_spatial_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: str,
    scale: float,
    heads: int,
    ctx: FrameShardingCtx,
) -> Optional[jnp.ndarray]:
    """Frame-sharded spatial attention through the flash kernels; returns
    None when the shape is unsupported (caller falls back)."""
    from motioneditor_tpu.ops.attention import (
        DENSE,
        MOTION_FRAME,
        NORMAL,
        SPARSE_CAUSAL,
    )
    from motioneditor_tpu.ops.video_flash import (
        video_flash_attention,
        video_flash_attention_kv,
        video_flash_kv_supported,
        video_flash_supported,
    )

    b, f, n, c = q.shape
    if not ctx.supports(f, n):
        return None
    # head-parallel over the model axis when the layout allows it (each
    # shard runs its own heads; attention has no cross-head math)
    hs = ctx.head_shards(heads, c)
    c_l, heads_l = c // hs, heads // hs
    m = {NORMAL: n, SPARSE_CAUSAL: 2 * n, MOTION_FRAME: 2 * n, DENSE: f * n}[mode]
    if mode == NORMAL:
        ok = video_flash_supported(n, c_l, heads_l, q.dtype.itemsize)
    else:
        ok = video_flash_kv_supported(n, m, c_l, heads_l, q.dtype.itemsize)
    if not ok:
        return None
    spec = ctx.token_spec(b, head_sharded=hs > 1)
    fa, fp = ctx.frame_axis, ctx.fp

    def local(ql, kl, vl):
        if mode == NORMAL:
            return video_flash_attention(ql, kl, vl, NORMAL, scale, heads_l)
        if mode == SPARSE_CAUSAL:
            first_k = _first_frame(kl, fa, fp)
            first_v = _first_frame(vl, fa, fp)
            prev_k = _prev_frames(kl, fa, fp)
            prev_v = _prev_frames(vl, fa, fp)
            fl = ql.shape[1]
            kk = jnp.concatenate(
                [jnp.broadcast_to(first_k, (first_k.shape[0], fl) + first_k.shape[2:]),
                 prev_k], axis=2)
            vv = jnp.concatenate(
                [jnp.broadcast_to(first_v, (first_v.shape[0], fl) + first_v.shape[2:]),
                 prev_v], axis=2)
        elif mode == MOTION_FRAME:
            kk = jnp.concatenate([_prev_frames(kl, fa, fp), kl], axis=2)
            vv = jnp.concatenate([_prev_frames(vl, fa, fp), vl], axis=2)
        else:  # DENSE
            kg = _all_frames(kl, fa)
            vg = _all_frames(vl, fa)
            bb = kg.shape[0]
            kk = kg.reshape(bb, 1, f * n, c_l)
            vv = vg.reshape(bb, 1, f * n, c_l)
        return video_flash_attention_kv(ql, kk, vv, scale, heads_l)

    return jax.shard_map(
        local, mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def sharded_injection_flash(
    q_tgt: jnp.ndarray,   # [2, F, N, C] edit-row queries (u, c)
    k_src: jnp.ndarray,   # [2, F, N, C] recon-row keys, row-aligned with q_tgt
    v_src: jnp.ndarray,
    k_tgt: jnp.ndarray,
    v_tgt: jnp.ndarray,
    mask: jnp.ndarray,    # [F, N] fg mask (key frames)
    scale: float,
    heads: int,
    ctx: FrameShardingCtx,
) -> Optional[jnp.ndarray]:
    """Frame-sharded fg/bg injection attention (fully_control.py:372-422):
    the motion-frame source [prev|cur] is built with the ppermute halo and
    the mask rides the same halo so each key block sees its own frame's
    mask. Returns None when unsupported."""
    from motioneditor_tpu.ops.video_flash import (
        video_flash_kv_supported,
        video_injection_attention_kv,
    )

    b, f, n, c = q_tgt.shape
    if not ctx.supports(f, n):
        return None
    hs = ctx.head_shards(heads, c)
    c_l, heads_l = c // hs, heads // hs
    if not video_flash_kv_supported(
        n, 2 * n, c_l, heads_l, q_tgt.dtype.itemsize, injection=True
    ):
        return None
    spec = ctx.token_spec(b, head_sharded=hs > 1)
    mspec = P(ctx.frame_axis, None)
    fa, fp = ctx.frame_axis, ctx.fp

    def local(ql, ksl, vsl, ktl, vtl, ml):
        ks2 = jnp.concatenate([_prev_frames(ksl, fa, fp), ksl], axis=2)
        vs2 = jnp.concatenate([_prev_frames(vsl, fa, fp), vsl], axis=2)
        # halo the mask exactly like the keys: [F_l, 2N] = [prev mask | cur]
        m4 = ml[None, ..., None]  # [1, F_l, N, 1] so _prev_frames applies
        m_prev = _prev_frames(m4, fa, fp)[0, ..., 0]
        m2 = jnp.concatenate([m_prev, ml], axis=1)
        return video_injection_attention_kv(
            ql, ks2, vs2, ktl, vtl, m2, scale, heads_l
        )

    return jax.shard_map(
        local, mesh=ctx.mesh,
        in_specs=(spec, spec, spec, spec, spec, mspec), out_specs=spec,
        check_vma=False,
    )(q_tgt, k_src, v_src, k_tgt, v_tgt, mask)


def sharded_temporal_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    heads: int,
    causal: bool,
    ctx: FrameShardingCtx,
) -> Optional[jnp.ndarray]:
    """Frame-sharded temporal attention: K/V all-gathered over ``frames``
    (Ulysses-style — F is small, SURVEY §2.8), causal mask applied at global
    frame indices inside the kernel. Returns None when unsupported."""
    from motioneditor_tpu.ops.temporal_flash import (
        _pick_block_n,
        temporal_flash_attention_global,
    )

    b, f, n, c = q.shape
    if not ctx.supports(f, n) or c % heads:
        return None
    hs = ctx.head_shards(heads, c)
    c_l, heads_l = c // hs, heads // hs
    fl = f // ctx.fp
    if _pick_block_n(n, fl + f, c_l, q.dtype.itemsize) < 8:
        return None
    spec = ctx.token_spec(b, head_sharded=hs > 1)
    fa = ctx.frame_axis

    def local(ql, kl, vl):
        kg = _all_frames(kl, fa)
        vg = _all_frames(vl, fa)
        off = jax.lax.axis_index(fa) * ql.shape[1]
        return temporal_flash_attention_global(
            ql, kg, vg, scale, heads_l, causal, off
        )

    return jax.shard_map(
        local, mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
