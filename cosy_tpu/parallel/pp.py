"""Pipeline parallelism: GPipe-style microbatch pipelining of a transformer
block stack over the mesh ``model`` axis.

The reference's only scale-out is DDP (SURVEY.md §2.5); this module is the
TPU-native inter-layer dimension: layer parameters are stacked over a
leading (L, ...) axis and sharded over the mesh axis, so each device holds a
contiguous stage of L/S blocks.  A ``shard_map`` runs the classic GPipe
schedule: at tick t, stage s processes microbatch (t - s) through its local
blocks (a ``lax.scan`` over the stage's stacked weights) and hands the
activation to stage s+1 via ``lax.ppermute``.  M microbatches drain in
M + S - 1 ticks; the bubble fraction is (S-1)/(M+S-1).

The math is identical to the sequential stack — same blocks, same order, a
scheduling rearrangement only.  Autodiff flows backward through scan +
ppermute, so the same function trains (the reverse pipeline is the natural
transpose).  Dropout inside the pipelined blocks would need per-layer rng
plumbing (the sequential path folds the context rng per call); the pipeline
asserts dropout-free blocks instead — training uses it with rates 0 or under
eval-style deterministic contexts.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ctx import Ctx, EVAL
from ..params import P


def stack_layer_params(params: Dict[str, jax.Array], prefix: str,
                       n_layers: int) -> Dict[str, jax.Array]:
    """Gather per-layer torch-named leaves ``{prefix}{i}.<leaf>`` into
    stacked (L, ...) arrays keyed by ``<leaf>``."""
    pat = re.compile(re.escape(prefix) + r"0\.(.+)$")
    leaves = [m.group(1) for k in params if (m := pat.match(k))]
    assert leaves, f"no layer-0 leaves under {prefix!r}"
    return {leaf: jnp.stack([params[f"{prefix}{i}.{leaf}"]
                             for i in range(n_layers)])
            for leaf in leaves}


def _apply_stage(stacked_local, cfg, x, attn_bias, pos_emb, ctx):
    """Run this stage's blocks: scan over the local (L/S, ...) weights."""
    from ..layers.conformer import transformer_layer

    def body(h, w):
        wl = {f"L.{k}": v for k, v in w.items()}
        return transformer_layer(P(wl), "L", cfg, h, attn_bias, pos_emb, ctx), None

    x, _ = jax.lax.scan(body, x, stacked_local)
    return x


def pipeline_blocks(
    stacked: Dict[str, jax.Array],
    cfg,
    xs: jax.Array,          # (B, T, D)
    attn_bias: jax.Array,   # (B, 1, T, T) or (B, T, T) additive
    pos_emb: jax.Array,     # (1, P, D) rel-pos table (shared)
    mesh: Mesh,
    n_micro: int,
    ctx: Ctx = EVAL,
    axis: str = "model",
) -> jax.Array:
    """Run the stacked block stack as an S-stage GPipe pipeline over
    ``mesh``'s ``axis``; returns the same value as the sequential stack."""
    assert not (ctx.train and cfg.dropout_rate > 0), \
        "pipeline blocks must be dropout-free (see module docstring)"
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    L = next(iter(stacked.values())).shape[0]
    B = xs.shape[0]
    assert L % S == 0, f"{L} blocks cannot split into {S} stages"
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    x_micro = xs.reshape(n_micro, mb, *xs.shape[1:])
    bias_micro = attn_bias.reshape(n_micro, mb, *attn_bias.shape[1:])

    def stage_fn(stacked_local, x_micro, bias_micro, pos_emb):
        # shard_map slices the sharded layer axis: leaves arrive (L/S, ...)
        stage = jax.lax.axis_index(axis)
        M = x_micro.shape[0]
        zero = jnp.zeros_like(x_micro[0])
        out = jnp.zeros_like(x_micro)

        def tick(carry, t):
            buf, out = carry
            m = t - stage                      # microbatch at this stage now
            valid = (m >= 0) & (m < M)
            m_idx = jnp.clip(m, 0, M - 1)
            inp = jnp.where(stage == 0, x_micro[m_idx], buf)
            bias = bias_micro[m_idx]
            y = _apply_stage(stacked_local, cfg, inp, bias, pos_emb, ctx)
            y = jnp.where(valid, y, zero)
            # last stage records its finished microbatch
            is_last = stage == S - 1
            rec = jnp.where(valid & is_last, y, 0.0)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, (out[m_idx] + rec)[None], m_idx, axis=0)
            # hand activations down the pipe (stage i -> i+1)
            perm = [(i, i + 1) for i in range(S - 1)]
            buf = jax.lax.ppermute(y, axis, perm) if S > 1 else y
            return (buf, out), None

        (_, out), _ = jax.lax.scan(tick, (zero, out), jnp.arange(n_micro + S - 1))
        # only the last stage holds real outputs — replicate via psum
        return jax.lax.psum(out, axis)

    spec_stacked = {k: PSpec(axis) for k in stacked}
    rep = PSpec()
    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(spec_stacked, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    out = fn(stacked, x_micro, bias_micro, pos_emb)
    return out.reshape(B, *xs.shape[1:])


def pipeline_encoder_forward(
    params: Dict[str, jax.Array],
    cfg,
    xs: jax.Array,
    xs_lens: jax.Array,
    mesh: Mesh,
    n_micro: int,
    ctx: Ctx = EVAL,
    xscale: bool = True,
    num_decoding_left_chunks: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Transformer encoder forward with the block stack pipelined
    (non-block parts — embed, masks, after_norm — run replicated; they are
    a negligible fraction of the work).  Matches
    layers.conformer.encoder_forward(conformer=False) exactly."""
    from ..layers import conformer as C
    from ..ops import masks as M

    p = P(params)
    B, T, _ = xs.shape
    pad_mask = M.make_non_pad_mask(xs_lens, T)[:, None, :]
    h, pos_emb = C.embed_input(p, cfg, xs, ctx, xscale=xscale)
    chunk_masks = M.add_optional_chunk_mask(
        T, pad_mask, cfg.use_dynamic_chunk, cfg.use_dynamic_left_chunk,
        0, cfg.static_chunk_size, num_decoding_left_chunks)
    attn_bias = M.mask_to_bias(chunk_masks, h.dtype)

    stacked = stack_layer_params(params, "encoders.", cfg.num_blocks)
    h = pipeline_blocks(stacked, cfg, h, attn_bias, pos_emb, mesh, n_micro, ctx)
    if cfg.normalize_before:
        h = C.layer_norm(p, "after_norm", h, eps=1e-5)
    return h, pad_mask


# ---------------------------------------------------------------------------
# context-based activation (mirrors parallel/sp.py): trainers enter
# pipeline_context and layers.conformer.encoder_forward dispatches its
# transformer stack through the pipeline when eligible
# ---------------------------------------------------------------------------

import threading as _threading
from contextlib import contextmanager as _contextmanager

_state = _threading.local()


@_contextmanager
def pipeline_context(mesh: Mesh, n_micro: int, axis: str = "model"):
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, n_micro, axis)
    try:
        yield
    finally:
        _state.ctx = prev


def maybe_pipeline(p, cfg, xs, xs_lens, ctx, xscale: bool,
                   num_decoding_left_chunks: int = -1):
    """Pipeline dispatch for encoder_forward's transformer path.  Returns
    (h, pad_mask) when a pipeline context is active and the stack is
    eligible (dropout-free — see module docstring; no train-time dynamic
    chunking, whose mask draw would need rng plumbing; stage-divisible
    block count, microbatch-divisible batch), else None."""
    pc = getattr(_state, "ctx", None)
    if pc is None:
        return None
    mesh, n_micro, axis = pc
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    eligible = (
        S > 1
        and cfg.num_blocks % S == 0
        and xs.shape[0] % n_micro == 0
        and not (ctx.train and (cfg.dropout_rate > 0
                                or cfg.attention_dropout_rate > 0
                                or cfg.positional_dropout_rate > 0))
        and not (ctx.train and cfg.use_dynamic_chunk)
    )
    if not eligible:
        return None
    _state.engaged = getattr(_state, "engaged", 0) + 1  # trace-time telemetry
    params = {k: p[k] for k in p.keys()}
    return pipeline_encoder_forward(
        params, cfg, xs, xs_lens, mesh, n_micro, ctx, xscale=xscale,
        num_decoding_left_chunks=num_decoding_left_chunks)
