"""Fused forward+backward CodeNeRF MLP for TRAINING (Pallas + custom VJP).

Why: the XLA backward of the MLP is HBM-bound — every layer's backward
reads a saved (R·S, 256) residual and writes a same-sized dx (~2.4 GB of
traffic per layer; profiled at 10-13 ms per layer-backward vs ~1 ms of MXU
compute). This op never materializes residuals in HBM: the backward kernel
recomputes a ray-tile's forward entirely in VMEM and chains the gradient
through all layers in one pass, accumulating per-weight gradients in f32
output blocks that stay VMEM-resident across the whole grid (constant
index_map). Per-tile HBM traffic collapses to the inputs, the cotangent,
and the per-ray gradient outputs.

Boundary: ``op(pe, sproj, tproj, vcontrib, *wflat) -> (R·S, 8)`` packed
[sigma | rgb | pad]. Everything upstream (positional encoding, per-ray code
projections, the enc_viewdir weight split — see ops/fused_mlp.py) is plain
differentiable XLA, so outer autodiff chains gradients onward to
xyz/viewdirs/codes/latent-weights; the op returns cotangents only for its
direct operands. Weight operands are f32 (their grads accumulate and return
f32); bf16 copies are cached in VMEM scratch on the first grid step.

Gradient semantics match ``jax.grad`` of ``apply_codenerf`` to bf16
rounding (tests/test_fused_train.py). Reference architecture:
``src/model.py:36-53``.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from codenerf_tpu.config import NetConfig
from codenerf_tpu.core.encoding import positional_encoding
from codenerf_tpu.ops import fused_mlp

# Backward tiles are smaller than forward ones: the kernel holds the saved
# layer outputs plus the f32 dW accumulators in VMEM (matmul INPUTS x_j are
# recomputed from y_{j-1} + proj in the backward sweep rather than stored).
# With f32 weight inputs + bf16 scratch caches, 16-ray tiles overflowed the
# 16 MB scoped VMEM limit by ~1.2 MB; passing the 2-D weights as bf16
# INPUTS (cast once in XLA) frees ~2.6 MB and 16-ray tiles fit.
_TILE_RAYS = 16


def fused_train_available(cfg: NetConfig, n_rays: int, n_samples: int) -> bool:
    return (
        cfg.W % 128 == 0
        and (cfg.W // 2) % 128 == 0
        and cfg.d_xyz <= 64   # PE input is padded to 64 lanes
        and cfg.shape_blocks >= 1
        and cfg.texture_blocks >= 1
        and n_rays % max(_TILE_RAYS, fused_mlp._TILE_RAYS) == 0
    )


def _weight_shapes(cfg: NetConfig) -> List[Tuple[str, tuple, tuple]]:
    """(name, w_shape, b_shape) in operand order. enc_viewdir's bias rides
    in vcontrib, so its slot here is a zero vector (gradient discarded)."""
    W = cfg.W
    shapes = [("enc_xyz", (64, W), (W,))]
    for j in range(cfg.shape_blocks):
        shapes.append((f"shape_{j}", (W, W), (W,)))
    shapes.append(("enc_shape", (W, W), (W,)))
    shapes.append(("sigma", (W,), (1,)))
    shapes.append(("enc_viewdir_pt", (W, W), (W,)))
    for j in range(cfg.texture_blocks):
        shapes.append((f"texture_{j}", (W, W), (W,)))
    shapes.append(("rgb_hidden", (W, W // 2), (W // 2,)))
    shapes.append(("rgb_out", (W // 2, 8), (8,)))
    return shapes


def flatten_params_f32(params, cfg: NetConfig) -> List[jnp.ndarray]:
    """Differentiable XLA construction of the f32 weight operand list from
    the model param pytree (padding/slicing as the kernels expect)."""
    W = cfg.W
    f32 = jnp.float32
    out: List[jnp.ndarray] = []

    def pad_rows(w, to):
        return jnp.concatenate(
            [w, jnp.zeros((to - w.shape[0], w.shape[1]), w.dtype)], 0
        ) if w.shape[0] < to else w

    def pad_cols(w, to):
        return jnp.concatenate(
            [w, jnp.zeros((w.shape[0], to - w.shape[1]), w.dtype)], 1
        ) if w.shape[1] < to else w

    out += [pad_rows(params["enc_xyz"]["w"].astype(f32), 64),
            params["enc_xyz"]["b"].astype(f32)]
    for j in range(cfg.shape_blocks):
        p = params[f"shape_{j}"]
        out += [p["w"].astype(f32), p["b"].astype(f32)]
    out += [params["enc_shape"]["w"].astype(f32),
            params["enc_shape"]["b"].astype(f32)]
    out += [params["sigma"]["w"][:, 0].astype(f32),
            params["sigma"]["b"].astype(f32)]
    out += [params["enc_viewdir"]["w"][:W].astype(f32),
            jnp.zeros((W,), f32)]
    for j in range(cfg.texture_blocks):
        p = params[f"texture_{j}"]
        out += [p["w"].astype(f32), p["b"].astype(f32)]
    out += [params["rgb_hidden"]["w"].astype(f32),
            params["rgb_hidden"]["b"].astype(f32)]
    b_rgb = params["rgb_out"]["b"].astype(f32)
    out += [pad_cols(params["rgb_out"]["w"].astype(f32), 8),
            jnp.concatenate([b_rgb, jnp.zeros((8 - b_rgb.shape[0],), f32)])]
    return out


def _bwd_kernel(cfg: NetConfig, S: int, *refs):
    """Backward kernel body. Ref order:
      in:      pe, sproj, tproj, vcontrib, g, (w_i, b_i)* — 2-D weights are
               bf16 (cast once in XLA), 1-D weights and biases f32
      out:     d_pe, d_sproj, d_tproj, d_vcontrib, (dw_i, db_i)*  — the
               (dw, db) blocks have constant index maps and act as VMEM
               accumulators across the grid
    """
    import jax.nn as jnn
    from jax.experimental import pallas as pl

    T = _TILE_RAYS
    P = T * S
    W = cfg.W
    nb, nt = cfg.shape_blocks, cfg.texture_blocks
    f32, bf16 = jnp.float32, jnp.bfloat16
    names = _weight_shapes(cfg)
    k = len(names)
    idx_of = {n: j for j, (n, _, _) in enumerate(names)}

    pe_ref, sproj_ref, tproj_ref, vcontrib_ref, g_ref = refs[:5]
    w_refs = refs[5:5 + 2 * k]
    d_pe_ref, d_sproj_ref, d_tproj_ref, d_vcontrib_ref = refs[5 + 2 * k:9 + 2 * k]
    dwb_refs = refs[9 + 2 * k:9 + 4 * k]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for j, (name, wshape, bshape) in enumerate(names):
            dwb_refs[2 * j][...] = jnp.zeros(wshape, f32)
            dwb_refs[2 * j + 1][...] = jnp.zeros(bshape, f32)

    def w(name):
        return w_refs[2 * idx_of[name]][...]

    def b(name):
        return w_refs[2 * idx_of[name] + 1][...]

    def dot(x, wm):  # (P, A) @ (A, B) -> f32
        return jax.lax.dot_general(
            x, wm, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def dot_t(g, wm):  # (P, B) @ (A, B)^T -> (P, A) f32
        return jax.lax.dot_general(
            g, wm, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def dot_acc(x, g):  # (P, A)^T @ (P, B) -> (A, B) f32
        return jax.lax.dot_general(
            x, g, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    def ray_sum(x):  # (P, W) f32 -> (T, W)
        return jnp.sum(x.reshape(T, S, W), axis=1)

    def inject(y, z_tile):
        return (y.reshape(T, S, W) + z_tile[:, None, :].astype(y.dtype)
                ).reshape(P, W)

    # ---------------- forward recompute (activations stay in VMEM)
    pe = pe_ref[...]
    sproj = sproj_ref[...]
    tproj = tproj_ref[...]
    vcontrib = vcontrib_ref[...]

    y0 = jnn.relu(dot(pe, w("enc_xyz")) + b("enc_xyz")).astype(bf16)
    ys = []
    cur = y0
    for j in range(nb):
        xj = inject(cur, sproj[:, j, :])
        cur = jnn.relu(dot(xj, w(f"shape_{j}")) + b(f"shape_{j}")).astype(bf16)
        ys.append(cur)
    t_in = cur
    t = (dot(t_in, w("enc_shape")) + b("enc_shape")).astype(bf16)
    w_sig = w_refs[2 * idx_of["sigma"]][...]      # (W,) f32
    b_sig = w_refs[2 * idx_of["sigma"] + 1][...]  # (1,) f32
    sig_pre = jnp.sum(t.astype(f32) * w_sig[None, :], axis=-1,
                      keepdims=True) + b_sig       # (P, 1) f32
    u = dot(t, w("enc_viewdir_pt"))
    yv = jnn.relu(
        u.reshape(T, S, W) + vcontrib[:, None, :].astype(f32)
    ).reshape(P, W).astype(bf16)
    yts = []
    cur = yv
    for j in range(nt):
        xtj = inject(cur, tproj[:, j, :])
        cur = jnn.relu(
            dot(xtj, w(f"texture_{j}")) + b(f"texture_{j}")).astype(bf16)
        yts.append(cur)
    r_in = cur
    r = jnn.relu(dot(r_in, w("rgb_hidden")) + b("rgb_hidden")).astype(bf16)

    # ---------------- backward chain
    g = g_ref[...]            # (P, 8) f32: [g_sigma | g_rgb...]
    g_sigma = g[:, :1]
    g_rgb = g[:, 1:8]

    def acc(name, x, gh):
        j = idx_of[name]
        dwb_refs[2 * j][...] += dot_acc(x, gh)
        dwb_refs[2 * j + 1][...] += jnp.sum(gh.astype(f32), axis=0)

    gh = g_rgb.astype(bf16)   # rgb_out is linear
    # rgb_out w is (W/2, 8): pad gh's 7 cols to 8 with zeros
    gh8 = jnp.concatenate([gh, jnp.zeros((P, 1), bf16)], axis=-1)
    acc("rgb_out", r, gh8)
    gr = dot_t(gh8, w("rgb_out"))            # (P, W/2) f32
    gh = (gr * (r.astype(f32) > 0)).astype(bf16)
    acc("rgb_hidden", r_in, gh)
    g_cur = dot_t(gh, w("rgb_hidden"))       # (P, W) f32
    for j in reversed(range(nt)):
        gh = (g_cur * (yts[j].astype(f32) > 0)).astype(bf16)
        xtj = inject(yts[j - 1] if j > 0 else yv, tproj[:, j, :])
        acc(f"texture_{j}", xtj, gh)
        g_cur = dot_t(gh, w(f"texture_{j}"))
        d_tproj_ref[:, j, :] = ray_sum(g_cur).astype(bf16)
    gu = g_cur * (yv.astype(f32) > 0)        # (P, W) f32
    d_vcontrib_ref[...] = ray_sum(gu).astype(bf16)
    gu16 = gu.astype(bf16)
    acc("enc_viewdir_pt", t, gu16)
    g_t = dot_t(gu16, w("enc_viewdir_pt"))
    # sigma head: d/dpre softplus = sigmoid(pre)
    dsig = g_sigma * jnn.sigmoid(sig_pre)    # (P, 1) f32
    g_t = g_t + dsig * w_sig[None, :]
    jsig = idx_of["sigma"]
    dwb_refs[2 * jsig][...] += jnp.sum(t.astype(f32) * dsig, axis=0)
    dwb_refs[2 * jsig + 1][...] += jnp.sum(dsig, axis=0)
    gh = g_t.astype(bf16)                    # enc_shape is linear
    acc("enc_shape", t_in, gh)
    g_cur = dot_t(gh, w("enc_shape"))
    for j in reversed(range(nb)):
        gh = (g_cur * (ys[j].astype(f32) > 0)).astype(bf16)
        xj = inject(ys[j - 1] if j > 0 else y0, sproj[:, j, :])
        acc(f"shape_{j}", xj, gh)
        g_cur = dot_t(gh, w(f"shape_{j}"))
        d_sproj_ref[:, j, :] = ray_sum(g_cur).astype(bf16)
    gh = (g_cur * (y0.astype(f32) > 0)).astype(bf16)
    acc("enc_xyz", pe, gh)
    d_pe_ref[...] = dot_t(gh, w("enc_xyz")).astype(bf16)


def _invoke_bwd(cfg: NetConfig, S: int, R: int, pe, sproj, tproj, vcontrib,
                wflat, g_packed):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = _TILE_RAYS
    P = T * S
    W = cfg.W
    names = _weight_shapes(cfg)
    k = len(names)
    n_tiles = R // T
    f32, bf16 = jnp.float32, jnp.bfloat16

    # 2-D weights enter the kernel bf16 (matmul operands; cast once here in
    # XLA); 1-D weights (sigma row) and biases stay f32. This halves the
    # VMEM-resident weight bytes vs f32 inputs + in-kernel bf16 caches.
    wops = [x.astype(bf16) if x.ndim == 2 else x for x in wflat]

    def tile_spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda nd: lambda i: (0,) * nd)(len(shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [
        tile_spec((P, 64), lambda i: (i, 0)),
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
        tile_spec((P, 8), lambda i: (i, 0)),
    ] + [const_spec(x.shape) for x in wops]

    out_shape = [
        jax.ShapeDtypeStruct((R * S, 64), bf16),                    # d_pe
        jax.ShapeDtypeStruct((R, cfg.shape_blocks, W), bf16),       # d_sproj
        jax.ShapeDtypeStruct((R, cfg.texture_blocks, W), bf16),     # d_tproj
        jax.ShapeDtypeStruct((R, W), bf16),                         # d_vcontrib
    ]
    out_specs = [
        tile_spec((P, 64), lambda i: (i, 0)),
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
    ]
    for name, wshape, bshape in names:
        out_shape += [jax.ShapeDtypeStruct(wshape, f32),
                      jax.ShapeDtypeStruct(bshape, f32)]
        out_specs += [const_spec(wshape), const_spec(bshape)]

    # FLOPs: ~3x the forward (recompute + dx + dW chains).
    flops_per_tile = 3 * 2 * P * W * (
        64 + W * (cfg.shape_blocks + 1 + 1 + cfg.texture_blocks) + W // 2
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, S),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * n_tiles,
            bytes_accessed=R * S * (64 * 2 + 8 * 4 + 64 * 2),
            transcendentals=R * S,
        ),
    )(pe, sproj, tproj, vcontrib, g_packed, *wops)
    return outs


def make_fused_train_op(cfg: NetConfig):
    """Build the custom-VJP op for this architecture.

    Returns ``op(pe, sproj, tproj, vcontrib, *wflat) -> (R*S, 8) f32`` where
    pe is (R*S, 64) bf16, sproj/tproj are (R, blocks, W) bf16, vcontrib is
    (R, W) bf16 and wflat is the f32 list from :func:`flatten_params_f32`.
    """

    @jax.custom_vjp
    def op(pe, sproj, tproj, vcontrib, *wflat):
        return _fwd(pe, sproj, tproj, vcontrib, *wflat)

    def _fwd(pe, sproj, tproj, vcontrib, *wflat):
        R = sproj.shape[0]
        S = pe.shape[0] // R
        wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x for x in wflat]
        return fused_mlp.invoke_fwd(cfg, S, R, pe, sproj, tproj, vcontrib, wb)

    def fwd_rule(pe, sproj, tproj, vcontrib, *wflat):
        out = _fwd(pe, sproj, tproj, vcontrib, *wflat)
        return out, (pe, sproj, tproj, vcontrib, wflat)

    def bwd_rule(res, g):
        pe, sproj, tproj, vcontrib, wflat = res
        R = sproj.shape[0]
        S = pe.shape[0] // R
        outs = _invoke_bwd(cfg, S, R, pe, sproj, tproj, vcontrib, wflat,
                           g.astype(jnp.float32))
        d_pe, d_sproj, d_tproj, d_vcontrib = outs[:4]
        return (d_pe, d_sproj, d_tproj, d_vcontrib, *outs[4:])

    op.defvjp(fwd_rule, bwd_rule)
    return op


def fused_apply_train(
    params,
    cfg: NetConfig,
    xyz: jnp.ndarray,          # (R, S, 3)
    viewdir: jnp.ndarray,      # (R, 3)
    shape_code: jnp.ndarray,   # (R, D) or (D,)
    texture_code: jnp.ndarray,
    op=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for ``apply_codenerf`` using the fused kernels.
    The surrounding math (PE, code projections, weight split) is plain XLA,
    so jax.grad flows to params, codes, xyz and viewdirs."""
    R, S = xyz.shape[0], xyz.shape[1]
    bf16 = jnp.bfloat16
    if shape_code.ndim == 1:
        shape_code = jnp.broadcast_to(shape_code, (R, shape_code.shape[-1]))
    if texture_code.ndim == 1:
        texture_code = jnp.broadcast_to(texture_code, (R, texture_code.shape[-1]))

    pe = positional_encoding(xyz, cfg.num_xyz_freq).reshape(R * S, cfg.d_xyz)
    pe = fused_mlp._pad_lanes(pe, 64).astype(bf16)
    vd_pe = positional_encoding(viewdir, cfg.num_dir_freq)

    def ray_proj(prefix, code, blocks):
        outs = []
        for j in range(blocks):
            p = params[f"{prefix}_{j}"]
            outs.append(jax.nn.relu(
                jnp.dot(code.astype(bf16), p["w"].astype(bf16),
                        preferred_element_type=jnp.float32) + p["b"]
            ).astype(bf16))
        return jnp.stack(outs, axis=1)

    sproj = ray_proj("shape_latent", shape_code, cfg.shape_blocks)
    tproj = ray_proj("texture_latent", texture_code, cfg.texture_blocks)
    w_encv = params["enc_viewdir"]["w"]
    vcontrib = (
        jnp.dot(vd_pe.astype(bf16), w_encv[cfg.W:].astype(bf16),
                preferred_element_type=jnp.float32)
        + params["enc_viewdir"]["b"]
    ).astype(bf16)

    wflat = flatten_params_f32(params, cfg)
    if op is None:
        op = make_fused_train_op(cfg)
    out = op(pe, sproj, tproj, vcontrib, *wflat)
    sigmas = out[:, 0].reshape(R, S)
    rgbs = out[:, 1:4].reshape(R, S, 3)
    return sigmas, rgbs
