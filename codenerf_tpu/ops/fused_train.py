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

Boundary: ``op(xyz8, sproj, tproj, vcontrib, *wflat) -> (R·S, 8)`` packed
[sigma | rgb | pad], with xyz8 the (R·S, 8) f32 zero-padded points — the
xyz positional encoding happens IN-KERNEL, forward and backward
(materializing it in HBM cost ~14 ms/step at flagship sizes, measured).
Everything else upstream (per-ray code projections, viewdir PE, the
enc_viewdir weight split — see ops/fused_mlp.py) is plain differentiable
XLA, so outer autodiff chains gradients onward to
xyz/viewdirs/codes/latent-weights; the op returns cotangents only for its
direct operands. Weight operands are f32 at the op boundary (their grads
accumulate and return f32); the 2-D weights are cast to bf16 once in XLA
before entering the kernel.

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
from codenerf_tpu.ops import fused_mlp

# Backward tiles are smaller than forward ones: the kernel holds the saved
# layer outputs plus the f32 dW accumulators in VMEM (matmul INPUTS x_j are
# recomputed from y_{j-1} + proj in the backward sweep rather than stored).
# With f32 weight inputs + bf16 scratch caches, 16-ray tiles overflowed the
# 16 MB scoped VMEM limit by ~1.2 MB; passing the 2-D weights as bf16
# INPUTS (cast once in XLA) plus raising the per-kernel scoped-vmem
# guardrail (see _invoke_bwd) lets larger tiles compile.
_TILE_RAYS = 16
# Single-pass training kernel tile (ray rows per grid step).
_TRAIN_TILE_RAYS = 16
_BWD_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def fused_train_available(cfg: NetConfig, n_rays: int, n_samples: int) -> bool:
    """True when the training/optimization kernels can tile this problem.
    ``n_samples`` is currently UNCONSTRAINED (every kernel keeps the whole
    sample axis in-tile, any S compiles) — the parameter exists so call
    sites stay correct if a sample-axis constraint ever appears."""
    del n_samples
    return (
        cfg.W % 128 == 0
        and (cfg.W // 2) % 128 == 0
        and cfg.d_xyz <= 64   # PE input is padded to 64 lanes
        and cfg.shape_blocks >= 1
        and cfg.texture_blocks >= 1
        and n_rays % max(_TILE_RAYS, _TRAIN_TILE_RAYS,
                         fused_mlp._TILE_RAYS) == 0
    )


def single_pass_available(cfg: NetConfig, n_rays: int) -> bool:
    """True when the SINGLE-PASS loss kernel (``invoke_train_fused``) can
    tile this problem. Looser than :func:`fused_train_available`: the
    single-pass kernel only tiles rays at ``_TRAIN_TILE_RAYS`` (16), not
    the forward plane kernel's 32 — a 10000-ray step is single-pass
    eligible even though the plane-op pair can't run it."""
    return (
        cfg.W % 128 == 0
        and (cfg.W // 2) % 128 == 0
        and cfg.d_xyz <= 64
        and cfg.shape_blocks >= 1
        and cfg.texture_blocks >= 1
        and n_rays % _TRAIN_TILE_RAYS == 0
    )


def hier_fine_zvals(z2d: jnp.ndarray, w_coarse: jnp.ndarray,
                    key_fine: jax.Array, n_importance: int) -> jnp.ndarray:
    """Standard NeRF importance sampling from the coarse single-pass
    kernel's weights plane — the ONE recipe shared by the hierarchical
    train/codes/pose single-pass paths (and matching
    ``renderer.render_rays``): interior coarse weights (behind
    stop_gradient) drive a piecewise-constant pdf over the z midpoints,
    and the union with the coarse z is what the fine pass evaluates.
    The z-midpoint chain stays DIFFERENTIABLE — pose optimization vjp's
    through it; training/codes never differentiate z so the chain is
    simply unused there."""
    from codenerf_tpu.core.sampling import sample_pdf, union_sorted_zvals

    z_mid = 0.5 * (z2d[:, 1:] + z2d[:, :-1])
    w_int = jax.lax.stop_gradient(w_coarse[:, 1:-1])
    z_fine = sample_pdf(key_fine, z_mid, w_int, n_importance,
                        deterministic=False)
    return union_sorted_zvals(z2d, z_fine)


def hier_fine_zvals_meta(z2d: jnp.ndarray, w_coarse: jnp.ndarray,
                         key_fine: jax.Array, n_importance: int):
    """:func:`hier_fine_zvals` plus the union metadata the DUAL-composite
    single-pass kernel consumes: ``(z_all, cmask, cdelta)``, all
    (R, Sc+Sf) f32. ``cmask`` is 1.0 where the union entry came from the
    coarse pass; ``cdelta`` carries the consecutive-COARSE deltas there
    (terminal coarse delta 1e10, matching the reference composite's
    ``src/utils.py:36``) and 0 at fine entries. One stable multi-operand
    sort (core/sampling.merge_sorted_samples) produces the union and both
    planes with the exact permutation ``union_sorted_zvals`` uses."""
    from codenerf_tpu.core.sampling import merge_sorted_samples, sample_pdf

    z_mid = 0.5 * (z2d[:, 1:] + z2d[:, :-1])
    w_int = jax.lax.stop_gradient(w_coarse[:, 1:-1])
    z_fine = sample_pdf(key_fine, z_mid, w_int, n_importance,
                        deterministic=False)
    cdelta = jnp.concatenate(
        [z2d[:, 1:] - z2d[:, :-1], jnp.full_like(z2d[:, :1], 1e10)], axis=-1)
    zeros_f = jnp.zeros_like(z_fine)
    z_all, (cmask, cdelta_u) = merge_sorted_samples(
        z2d, z_fine,
        [jnp.ones_like(z2d), cdelta],
        [zeros_f, zeros_f])
    return z_all, cmask, cdelta_u


def add_cotangent(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum two per-ray cotangent planes in f32 regardless of their (bf16)
    storage dtype — used to merge the coarse and fine kernel calls'
    cotangents before the shared prologue VJP."""
    f32 = jnp.float32
    return (a.astype(f32) + b.astype(f32)).astype(a.dtype)


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


def _tile_helpers(cfg: NetConfig, S: int, T: int, w_refs, idx_of):
    """Shared per-tile closures for the training kernels (weight/bias ref
    accessors and the f32-accumulating dot products)."""
    import types

    P = T * S
    W = cfg.W
    f32 = jnp.float32

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

    return types.SimpleNamespace(w=w, b=b, dot=dot, dot_t=dot_t,
                                 dot_acc=dot_acc, ray_sum=ray_sum,
                                 inject=inject)


def _tile_forward(cfg: NetConfig, S: int, T: int, h, pe, sproj, tproj,
                  vcontrib):
    """Forward over one T-ray tile; the returned activations live in VMEM
    for the kernel's duration (the backward chain reads them directly).
    ``pe`` is the bf16 in-kernel positional encoding. ``sig_pre`` is kept
    (T, S) f32 — Mosaic cannot reshape (T, S) <-> (P, 1), so the whole
    sigma chain stays rays-by-samples."""
    import jax.nn as jnn

    P = T * S
    W = cfg.W
    f32, bf16 = jnp.float32, jnp.bfloat16
    y0 = jnn.relu(h.dot(pe, h.w("enc_xyz")) + h.b("enc_xyz")).astype(bf16)
    ys = []
    cur = y0
    for j in range(cfg.shape_blocks):
        xj = h.inject(cur, sproj[:, j, :])
        cur = jnn.relu(
            h.dot(xj, h.w(f"shape_{j}")) + h.b(f"shape_{j}")).astype(bf16)
        ys.append(cur)
    t = (h.dot(cur, h.w("enc_shape")) + h.b("enc_shape")).astype(bf16)
    w_sig = h.w("sigma")                          # (W,) f32
    sig_pre = jnp.sum(t.astype(f32) * w_sig[None, :], axis=-1
                      ).reshape(T, S) + h.b("sigma")[0]
    u = h.dot(t, h.w("enc_viewdir_pt"))
    yv = jnn.relu(
        u.reshape(T, S, W) + vcontrib[:, None, :].astype(f32)
    ).reshape(P, W).astype(bf16)
    yts = []
    cur = yv
    for j in range(cfg.texture_blocks):
        xtj = h.inject(cur, tproj[:, j, :])
        cur = jnn.relu(
            h.dot(xtj, h.w(f"texture_{j}")) + h.b(f"texture_{j}")
        ).astype(bf16)
        yts.append(cur)
    r = jnn.relu(h.dot(cur, h.w("rgb_hidden")) + h.b("rgb_hidden")
                 ).astype(bf16)
    return dict(pe=pe, y0=y0, ys=ys, t=t, sig_pre=sig_pre, w_sig=w_sig,
                yv=yv, yts=yts, r=r)


def _tile_backward(cfg: NetConfig, S: int, T: int, h, acts, sproj, tproj,
                   g_sigma, g8_3, dwb_refs, idx_of,
                   weight_grads: bool,
                   d_sproj_ref, d_tproj_ref, d_vcontrib_ref,
                   want_input_chain: bool):
    """dx/dW chain over one tile given the sigma-plane cotangent ``g_sigma``
    ((T, S) f32) and rgb cotangents ``g8_3`` ((T, S, 8)). Writes the
    per-ray code cotangents; when ``weight_grads`` the dW/db pairs
    accumulate into ``dwb_refs``. Returns the enc_xyz-layer cotangent
    (bf16) when ``want_input_chain`` — the caller finishes the PE/xyz
    Jacobian — else None. Cotangent planes stay (T, S); per-point forms
    are built with 3-D broadcasts."""
    import jax.nn as jnn

    P = T * S
    W = cfg.W
    f32, bf16 = jnp.float32, jnp.bfloat16
    nb, nt = cfg.shape_blocks, cfg.texture_blocks

    def acc(name, x, gh):
        if not weight_grads:
            return
        j = idx_of[name]
        dwb_refs[2 * j][...] += h.dot_acc(x, gh)
        dwb_refs[2 * j + 1][...] += jnp.sum(gh.astype(f32), axis=0)
    pe, y0, ys, t, sig_pre, w_sig, yv, yts, r = (
        acts["pe"], acts["y0"], acts["ys"], acts["t"], acts["sig_pre"],
        acts["w_sig"], acts["yv"], acts["yts"], acts["r"])
    t_in = ys[-1]
    r_in = yts[-1]

    # rgb_out is linear; its w is (W/2, 8) with real rgb in cols 0..2
    gh8 = g8_3.reshape(P, 8).astype(bf16)
    acc("rgb_out", r, gh8)
    gr = h.dot_t(gh8, h.w("rgb_out"))            # (P, W/2) f32
    gh = (gr * (r.astype(f32) > 0)).astype(bf16)
    acc("rgb_hidden", r_in, gh)
    g_cur = h.dot_t(gh, h.w("rgb_hidden"))       # (P, W) f32
    for j in reversed(range(nt)):
        gh = (g_cur * (yts[j].astype(f32) > 0)).astype(bf16)
        xtj = h.inject(yts[j - 1] if j > 0 else yv, tproj[:, j, :])
        acc(f"texture_{j}", xtj, gh)
        g_cur = h.dot_t(gh, h.w(f"texture_{j}"))
        d_tproj_ref[:, j, :] = h.ray_sum(g_cur).astype(bf16)
    gu = g_cur * (yv.astype(f32) > 0)            # (P, W) f32
    d_vcontrib_ref[...] = h.ray_sum(gu).astype(bf16)
    gu16 = gu.astype(bf16)
    acc("enc_viewdir_pt", t, gu16)
    g_t = h.dot_t(gu16, h.w("enc_viewdir_pt"))
    # sigma head: d/dpre softplus = sigmoid(pre); all in (T, S, .) space
    dsig = g_sigma * jnn.sigmoid(sig_pre)        # (T, S) f32
    g_t = (g_t.reshape(T, S, W)
           + dsig[:, :, None] * w_sig[None, None, :]).reshape(P, W)
    if weight_grads:
        jsig = idx_of["sigma"]
        t_dsig = (t.astype(f32).reshape(T, S, W)
                  * dsig[:, :, None]).reshape(P, W)
        dwb_refs[2 * jsig][...] += jnp.sum(t_dsig, axis=0)
        dwb_refs[2 * jsig + 1][...] += jnp.broadcast_to(jnp.sum(dsig), (1,))
    gh = g_t.astype(bf16)                        # enc_shape is linear
    acc("enc_shape", t_in, gh)
    g_cur = h.dot_t(gh, h.w("enc_shape"))
    for j in reversed(range(nb)):
        gh = (g_cur * (ys[j].astype(f32) > 0)).astype(bf16)
        xj = h.inject(ys[j - 1] if j > 0 else y0, sproj[:, j, :])
        acc(f"shape_{j}", xj, gh)
        g_cur = h.dot_t(gh, h.w(f"shape_{j}"))
        d_sproj_ref[:, j, :] = h.ray_sum(g_cur).astype(bf16)
    if weight_grads or want_input_chain:
        gh = (g_cur * (y0.astype(f32) > 0)).astype(bf16)
        acc("enc_xyz", pe, gh)
        if want_input_chain:
            return gh
    return None


def _bwd_kernel(cfg: NetConfig, S: int, weight_grads: bool,
                input_grads: bool, *refs):
    """Backward kernel body. Ref order:
      in:      ro8 (T,8), vd8 (T,8), z (T,S), sproj, tproj, vcontrib,
               gsig, gr, gg, gb (T,S cotangent planes),
               peA, m_id, m_sin, m_cos, (w_i, b_i)* — 2-D weights are bf16
               (cast once in XLA), 1-D weights and biases f32
      out:     [input_grads: d_ro8 (T,8), d_vd8 (T,8), d_z (T,S)],
               d_sproj, d_tproj, d_vcontrib,
               [weight_grads: (dw_i, db_i)*] — the (dw, db) blocks have
               constant index maps and act as VMEM accumulators across the
               grid. The xyz expansion AND the positional encoding run
               in-kernel both ways (xyz = ro + vd*z, pe = f(xyz) in the
               recompute; d_xyz = J_pe^T d_pe then d_ro/d_vd/d_z at the
               end, exact, f32) — nothing (R*S, small)-shaped ever touches
               HBM. (The volume-rendering backward deliberately does NOT
               run here — see ops/pallas_composite.py.)

    ``weight_grads=False`` (test-time CODE optimization: model frozen,
    reference ``src/optimizer.py:195-198``) drops every dW/db accumulation
    — one of the three W×W matmuls per layer — and the f32 accumulator
    blocks; ``input_grads=False`` additionally stops the dx chain after
    the first shape block (no enc_xyz backward, no PE Jacobian, no
    d_ro/d_vd/d_z), since codes only feed sproj/tproj/vcontrib.
    """
    from jax.experimental import pallas as pl

    T = _TILE_RAYS
    P = T * S
    f32, bf16 = jnp.float32, jnp.bfloat16
    names = _weight_shapes(cfg)
    k = len(names)
    idx_of = {n: j for j, (n, _, _) in enumerate(names)}

    (ro_ref, vd_ref, z_ref, sproj_ref, tproj_ref, vcontrib_ref,
     gsig_ref, gr_ref, gg_ref, gb_ref) = refs[:10]
    peA_ref, peid_ref, pesin_ref, pecos_ref = refs[10:14]
    w_refs = refs[14:14 + 2 * k]
    out_refs = list(refs[14 + 2 * k:])
    if input_grads:
        d_ro_ref, d_vd_ref, d_z_ref = out_refs[:3]
        out_refs = out_refs[3:]
    d_sproj_ref, d_tproj_ref, d_vcontrib_ref = out_refs[:3]
    dwb_refs = out_refs[3:]

    i = pl.program_id(0)

    if weight_grads:
        @pl.when(i == 0)
        def _init():
            for j, (name, wshape, bshape) in enumerate(names):
                dwb_refs[2 * j][...] = jnp.zeros(wshape, f32)
                dwb_refs[2 * j + 1][...] = jnp.zeros(bshape, f32)

    h = _tile_helpers(cfg, S, T, w_refs, idx_of)

    # ---------------- forward recompute (activations stay in VMEM)
    ro8 = ro_ref[...]                                     # (T, 8) f32
    vd8 = vd_ref[...]                                     # (T, 8) f32
    z = z_ref[...]                                        # (T, S) f32
    xyz8 = (ro8[:, None, :] + vd8[:, None, :] * z[:, :, None]).reshape(P, 8)
    peA = peA_ref[...]
    m_id, m_sin, m_cos = peid_ref[...], pesin_ref[...], pecos_ref[...]
    pe_f32, t_pe = fused_mlp._pe_in_kernel(xyz8, peA, m_id, m_sin, m_cos)
    pe = pe_f32.astype(bf16)
    sproj = sproj_ref[...]
    tproj = tproj_ref[...]
    acts = _tile_forward(cfg, S, T, h, pe, sproj, tproj, vcontrib_ref[...])

    # ---------------- backward chain (one-hot lane masks from iota —
    # kernels cannot capture array constants)
    g_sigma = gsig_ref[...]                               # (T, S) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, S, 8), 2)
    g8_3 = (jnp.where(lane == 0, gr_ref[...][:, :, None], 0.0)
            + jnp.where(lane == 1, gg_ref[...][:, :, None], 0.0)
            + jnp.where(lane == 2, gb_ref[...][:, :, None], 0.0))

    gh = _tile_backward(cfg, S, T, h, acts, sproj, tproj, g_sigma, g8_3,
                        dwb_refs, idx_of, weight_grads,
                        d_sproj_ref, d_tproj_ref, d_vcontrib_ref,
                        want_input_chain=input_grads)
    if input_grads:
        d_pe = h.dot_t(gh, h.w("enc_xyz"))                    # (P, 64) f32
        dpe_dt = m_id + m_sin * jnp.cos(t_pe) - m_cos * jnp.sin(t_pe)
        d_xyz8 = jax.lax.dot_general(
            d_pe * dpe_dt, peA,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # @ A^T
        d_xyz3 = d_xyz8.reshape(T, S, 8)
        d_z_ref[...] = jnp.sum(d_xyz3 * vd8[:, None, :], axis=-1)  # (T, S)
        d_ro_ref[...] = jnp.sum(d_xyz3, axis=1)                    # (T, 8)
        d_vd_ref[...] = jnp.sum(d_xyz3 * z[:, :, None], axis=1)    # (T, 8)


def _train_kernel(cfg: NetConfig, S: int, white_bg: bool, scale: float,
                  want_weights: bool, want_rgb: bool, weight_grads: bool,
                  input_grads: bool, dual: bool, *refs):
    """SINGLE-PASS training kernel: forward + volume rendering + per-ray
    MSE cotangent + full backward in one grid step per ray tile.

    Why: the two-kernel training op pays 4F of MLP matmul FLOPs per step —
    the forward kernel computes F, then the backward kernel RECOMPUTES the
    forward (its activations can't survive in VMEM between two pallas
    calls) before its 2F of dx/dW chains. Here the forward's activations
    never leave VMEM, the composite+loss run on them in-tile, and the
    backward chains immediately: 3F total. The per-ray loss must be plain
    MSE against a ``gt`` operand for the cotangent ``2·scale·(rgb−gt)``
    to be computable in-kernel — which is exactly the training loss
    (reference ``src/trainer.py:75``); reg/metrics stay in XLA.

    Ref order:
      in:  ro8 (T,8), vd8 (T,8), z (T,S), sproj, tproj, vcontrib,
           gt8 (T,8) [gt rgb in lanes 0..2],
           peA, m_id, m_sin, m_cos, (w_i, b_i)*
      out: se8 (T,8) per-ray squared-error rows (lanes 0..2; summed by XLA),
           d_sproj, d_tproj, d_vcontrib,
           [weights (T,S) — only when ``want_weights``; the compositing
           weights plane that drives hierarchical importance sampling],
           [rgb8 (T,8) — only when ``want_rgb``; the composited
           [r|g|b|depth|acc|...] rows, for progress renders],
           [d_ro8 (T,8), d_vd8 (T,8), d_z (T,S) — only when
           ``input_grads``; the exact ray/depth cotangents: the xyz/PE
           Jacobian chain plus the in-kernel composite's own z term.
           TRAINING never differentiates through rays or depths
           (hierarchical z is behind stop_gradient upstream), but POSE
           optimization does — its gradient flows through ray generation
           and the sampling bounds],
           [(dw_i, db_i)* accumulators — only when ``weight_grads``;
           weight_grads=False is the frozen-model (test-time codes/pose)
           variant: the dW/db chains and accumulator blocks vanish,
           2F total].

    ``dual=True`` is the hierarchical UNION variant: z is the union-sorted
    coarse+fine depths, and two extra (T, S) inputs follow gt8 — cmask
    (1.0 at coarse positions) and cdelta (consecutive-coarse deltas there,
    0 at fine positions). The kernel then computes the COARSE composite
    too (``composite_fwd_dual_in_kernel``), writes its squared error
    into se lanes 4..6 (fine stays in 0..2), and sums both composites'
    sigma/rgb cotangents into the one backward chain — the exact gradient
    of ``fine_mse + coarse_mse`` from a single MLP evaluation at the
    union. The coarse pass upstream is then forward-only (sigma-only
    kernel → XLA weights → sample_pdf): total hierarchical cost drops
    from 3F@coarse + 3F@union to ~0.6F@coarse + 3F@union.
    """
    import jax.nn as jnn
    from jax.experimental import pallas as pl

    T = _TRAIN_TILE_RAYS
    P = T * S
    f32, bf16 = jnp.float32, jnp.bfloat16
    names = _weight_shapes(cfg)
    k = len(names)
    idx_of = {n: j for j, (n, _, _) in enumerate(names)}

    (ro_ref, vd_ref, z_ref, sproj_ref, tproj_ref, vcontrib_ref,
     gt_ref) = refs[:7]
    n_in = 7
    if dual:
        cmask_ref, cdelta_ref = refs[7:9]
        n_in = 9
    peA_ref, peid_ref, pesin_ref, pecos_ref = refs[n_in:n_in + 4]
    w_refs = refs[n_in + 4:n_in + 4 + 2 * k]
    (se_ref, d_sproj_ref, d_tproj_ref, d_vcontrib_ref) = \
        refs[n_in + 4 + 2 * k:n_in + 8 + 2 * k]
    n_head = n_in + 8 + 2 * k
    if want_weights:
        weights_ref = refs[n_head]
        n_head += 1
    if want_rgb:
        rgb_ref = refs[n_head]
        n_head += 1
    if input_grads:
        d_ro_ref, d_vd_ref, d_z_ref = refs[n_head:n_head + 3]
        n_head += 3
    dwb_refs = refs[n_head:n_head + 2 * k] if weight_grads else []

    i = pl.program_id(0)

    if weight_grads:
        @pl.when(i == 0)
        def _init():
            for j, (name, wshape, bshape) in enumerate(names):
                dwb_refs[2 * j][...] = jnp.zeros(wshape, f32)
                dwb_refs[2 * j + 1][...] = jnp.zeros(bshape, f32)

    h = _tile_helpers(cfg, S, T, w_refs, idx_of)

    # ---------------- forward (activations stay live in VMEM)
    ro8 = ro_ref[...]
    vd8 = vd_ref[...]
    z = z_ref[...]
    xyz8 = (ro8[:, None, :] + vd8[:, None, :] * z[:, :, None]).reshape(P, 8)
    peA = peA_ref[...]
    m_id, m_sin, m_cos = peid_ref[...], pesin_ref[...], pecos_ref[...]
    pe_f32, t_pe = fused_mlp._pe_in_kernel(xyz8, peA, m_id, m_sin, m_cos)
    pe = pe_f32.astype(bf16)
    sproj = sproj_ref[...]
    tproj = tproj_ref[...]
    acts = _tile_forward(cfg, S, T, h, pe, sproj, tproj, vcontrib_ref[...])
    rgb8 = h.dot(acts["r"], h.w("rgb_out")) + h.b("rgb_out")  # (P, 8) f32
    sigma = jnn.softplus(acts["sig_pre"])                     # (T, S) f32
    rgb3 = rgb8.reshape(T, S, 8)
    c0, c1, c2 = rgb3[:, :, 0], rgb3[:, :, 1], rgb3[:, :, 2]

    # ---------------- volume rendering + MSE cotangent (in-tile).
    # (S, S)-matmul composite: a VPU lane-scan spelling (Hillis-Steele
    # doubling via pltpu.roll) was measured 18 ms/step SLOWER — the ~20
    # lane rotates each pay a relayout; the small matmuls, despite padding
    # 16 rows to the MXU's 128, cost only ~4 ms over the fat-tile kernel.
    gt8 = gt_ref[...]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (T, 8), 1)
    if dual:
        # Both composites from the one evaluation, ROW-STACKED into a
        # single op sequence (a separate masked composite measured
        # +19.2 ms/step — serialization-bound, see fused_mlp). Coarse SE
        # rides lanes 4..6 (fine keeps 0..2; a (T, 8) @ (8, 8) shift
        # matmul moves it — Mosaic has no cheap lane roll), and the
        # backward helper returns the two composites' cotangents already
        # summed for the one backward chain.
        cmask, cdelta = cmask_ref[...], cdelta_ref[...]
        out8, out8_c, aux = fused_mlp.composite_fwd_dual_in_kernel(
            sigma, c0, c1, c2, z, cdelta, cmask, white_bg)
        if want_rgb:
            rgb_ref[...] = out8
        diff = jnp.where(lane8 < 3, out8 - gt8, 0.0)    # (T, 8)
        diff_c = jnp.where(lane8 < 3, out8_c - gt8, 0.0)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        shift4 = ((r8 + 4 == c8) & (r8 < 3)).astype(f32)
        se8 = diff * diff + jax.lax.dot_general(
            diff_c * diff_c, shift4, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        g8 = (2.0 * scale) * diff
        g8_c = (2.0 * scale) * diff_c
        g_sigma, gc0, gc1, gc2 = fused_mlp.composite_bwd_dual_in_kernel(
            c0, c1, c2, z, g8, g8_c, aux, white_bg)
        dz_comp = None                   # training-only mode: no d(z)
    else:
        out8, aux = fused_mlp.composite_fwd_in_kernel(
            sigma, c0, c1, c2, z, white_bg)
        if want_weights:
            weights_ref[...] = aux[4]    # w = alpha * T, (T, S) f32
        if want_rgb:
            rgb_ref[...] = out8
        diff = jnp.where(lane8 < 3, out8 - gt8, 0.0)    # (T, 8)
        se8 = diff * diff            # per-ray SE rows; summed by XLA
        g8 = (2.0 * scale) * diff                       # d out8
        g_sigma, gc0, gc1, gc2, dz_comp = \
            fused_mlp.composite_bwd_in_kernel(
                sigma, c0, c1, c2, z, g8, aux, white_bg)
    se_ref[...] = se8

    # ---------------- backward chain (stored activations — no recompute)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, S, 8), 2)
    g8_3 = (jnp.where(lane == 0, gc0[:, :, None], 0.0)
            + jnp.where(lane == 1, gc1[:, :, None], 0.0)
            + jnp.where(lane == 2, gc2[:, :, None], 0.0))

    gh = _tile_backward(cfg, S, T, h, acts, sproj, tproj, g_sigma, g8_3,
                        dwb_refs, idx_of, weight_grads,
                        d_sproj_ref, d_tproj_ref, d_vcontrib_ref,
                        want_input_chain=input_grads)
    if input_grads:
        # PE/xyz Jacobian chain (same math as _bwd_kernel) plus the
        # composite's own z cotangent — together the EXACT d(ro, vd, z).
        d_pe = h.dot_t(gh, h.w("enc_xyz"))                    # (P, 64) f32
        dpe_dt = m_id + m_sin * jnp.cos(t_pe) - m_cos * jnp.sin(t_pe)
        d_xyz8 = jax.lax.dot_general(
            d_pe * dpe_dt, peA,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # @ A^T
        d_xyz3 = d_xyz8.reshape(T, S, 8)
        d_z_ref[...] = dz_comp + jnp.sum(d_xyz3 * vd8[:, None, :], axis=-1)
        d_ro_ref[...] = jnp.sum(d_xyz3, axis=1)                    # (T, 8)
        d_vd_ref[...] = jnp.sum(d_xyz3 * z[:, :, None], axis=1)    # (T, 8)


def invoke_train_fused(cfg: NetConfig, S: int, R: int, white_bg: bool,
                       scale: float, ro8, vd8, z, sproj, tproj, vcontrib,
                       gt8, wflat, want_weights: bool = False,
                       want_rgb: bool = False, weight_grads: bool = True,
                       input_grads: bool = False,
                       coarse_mask=None, coarse_delta=None):
    """Run the single-pass training kernel. Returns
    ``(se_sum () f32, d_sproj, d_tproj, d_vcontrib, [weights], [rgb8],
    [d_ro8, d_vd8, d_z], [dw_i/db_i f32...])`` where se_sum is Σ over
    rays of Σ_rgb (rgb−gt)²
    and the weight gradients match the operand order of
    :func:`flatten_params_f32` (already scaled by the in-kernel
    ``2·scale`` cotangent).

    ``want_weights=True`` inserts the (R, S) f32 compositing-weights plane
    after ``d_vcontrib`` — the coarse pass of fused hierarchical training
    reads it (behind stop_gradient) to drive ``sample_pdf``, so the
    coarse forward never runs twice. ``want_rgb=True`` additionally emits
    the per-ray composited (R, 8) ``[r|g|b|depth|acc|..]`` rows (progress
    renders ride the optimization for free). ``weight_grads=False`` is
    the frozen-model variant for test-time CODE optimization (reference
    ``src/optimizer.py:195-198``): no dW/db chains or outputs — 2F of MLP
    FLOPs instead of 3F. ``input_grads=True`` additionally emits the
    exact ray/depth cotangents ``(d_ro8 (R,8), d_vd8 (R,8), d_z (R,S))``
    after the rgb plane — the POSE-optimization variant, whose gradient
    flows through ray generation and the sampling bounds.

    ``coarse_mask``/``coarse_delta`` (both (R, S) f32, together or not at
    all) select the DUAL-composite hierarchical mode: z is the
    union-sorted coarse+fine depths and the kernel also computes the
    coarse loss from the same evaluation (see ``_train_kernel``). The
    return gains a second element ``se_coarse`` after ``se`` and every
    cotangent is that of ``scale·(se_fine + se_coarse)`` — the sum of
    both losses' chains from one evaluation. Incompatible with
    ``want_weights`` (the coarse weights were computed upstream by the
    sigma-only forward) and ``input_grads`` (training never
    differentiates depths; the masked composite emits no dz)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dual = coarse_mask is not None
    if dual != (coarse_delta is not None):
        raise ValueError("coarse_mask and coarse_delta come together")
    if dual and (want_weights or input_grads):
        raise ValueError("dual-composite mode excludes want_weights and "
                         "input_grads (training-only path)")

    T = _TRAIN_TILE_RAYS
    P = T * S
    W = cfg.W
    names = _weight_shapes(cfg)
    n_tiles = R // T
    f32, bf16 = jnp.float32, jnp.bfloat16

    wops = [x.astype(bf16) if x.ndim == 2 else x for x in wflat]

    def tile_spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda nd: lambda i: (0,) * nd)(len(shape)),
                            memory_space=pltpu.VMEM)

    pe_ops = fused_mlp.pe_const_operands(cfg.num_xyz_freq)
    in_specs = [
        tile_spec((T, 8), lambda i: (i, 0)),                 # ro8
        tile_spec((T, 8), lambda i: (i, 0)),                 # vd8
        tile_spec((T, S), lambda i: (i, 0)),                 # z
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
        tile_spec((T, 8), lambda i: (i, 0)),                 # gt8
    ]
    if dual:
        in_specs += [tile_spec((T, S), lambda i: (i, 0)),    # cmask
                     tile_spec((T, S), lambda i: (i, 0))]    # cdelta
    in_specs += [const_spec(c.shape) for c in pe_ops] \
        + [const_spec(x.shape) for x in wops]

    out_shape = [
        jax.ShapeDtypeStruct((R, 8), f32),                          # se rows
        jax.ShapeDtypeStruct((R, cfg.shape_blocks, W), bf16),       # d_sproj
        jax.ShapeDtypeStruct((R, cfg.texture_blocks, W), bf16),     # d_tproj
        jax.ShapeDtypeStruct((R, W), bf16),                         # d_vcontrib
    ]
    out_specs = [
        tile_spec((T, 8), lambda i: (i, 0)),
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
    ]
    if want_weights:
        out_shape.append(jax.ShapeDtypeStruct((R, S), f32))         # weights
        out_specs.append(tile_spec((T, S), lambda i: (i, 0)))
    if want_rgb:
        out_shape.append(jax.ShapeDtypeStruct((R, 8), f32))         # rgb8
        out_specs.append(tile_spec((T, 8), lambda i: (i, 0)))
    if input_grads:
        out_shape += [jax.ShapeDtypeStruct((R, 8), f32),            # d_ro8
                      jax.ShapeDtypeStruct((R, 8), f32),            # d_vd8
                      jax.ShapeDtypeStruct((R, S), f32)]            # d_z
        out_specs += [tile_spec((T, 8), lambda i: (i, 0)),
                      tile_spec((T, 8), lambda i: (i, 0)),
                      tile_spec((T, S), lambda i: (i, 0))]
    if weight_grads:
        for name, wshape, bshape in names:
            out_shape += [jax.ShapeDtypeStruct(wshape, f32),
                          jax.ShapeDtypeStruct(bshape, f32)]
            out_specs += [const_spec(wshape), const_spec(bshape)]

    # 3x forward FLOPs (fwd + dx + dW), no recompute; the dW chain — one
    # of the three W-square matmuls per layer — is absent in codes-only
    # (weight_grads=False) mode.
    flops_per_tile = (3 if weight_grads else 2) * 2 * P * W * (
        64 + W * (cfg.shape_blocks + 1 + 1 + cfg.texture_blocks) + W // 2
    )
    operands = [ro8, vd8, z, sproj, tproj, vcontrib, gt8]
    if dual:
        operands += [coarse_mask, coarse_delta]
    outs = pl.pallas_call(
        functools.partial(_train_kernel, cfg, S, white_bg, scale,
                          want_weights, want_rgb, weight_grads,
                          input_grads, dual),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * n_tiles,
            bytes_accessed=R * S * (64 * 2 + 8 * 4 + 64 * 2),
            transcendentals=R * S * 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT_BYTES),
    )(*operands, *pe_ops, *wops)
    if dual:
        se = jnp.sum(outs[0][:, :4])          # fine SE, lanes 0..2
        se_c = jnp.sum(outs[0][:, 4:])        # coarse SE, lanes 4..6
        return (se, se_c) + tuple(outs[1:])
    se = jnp.sum(outs[0])
    return (se,) + tuple(outs[1:])


def _invoke_bwd(cfg: NetConfig, S: int, R: int, ro8, vd8, z, sproj, tproj,
                vcontrib, wflat, g_planes, weight_grads: bool = True,
                input_grads: bool = True):
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

    pe_ops = fused_mlp.pe_const_operands(cfg.num_xyz_freq)
    g_specs = [tile_spec((T, S), lambda i: (i, 0))] * 4
    in_specs = [
        tile_spec((T, 8), lambda i: (i, 0)),                 # ro8
        tile_spec((T, 8), lambda i: (i, 0)),                 # vd8
        tile_spec((T, S), lambda i: (i, 0)),                 # z
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
    ] + g_specs \
      + [const_spec(c.shape) for c in pe_ops] \
      + [const_spec(x.shape) for x in wops]

    out_shape = []
    out_specs = []
    if input_grads:
        out_shape += [
            jax.ShapeDtypeStruct((R, 8), f32),                      # d_ro8
            jax.ShapeDtypeStruct((R, 8), f32),                      # d_vd8
            jax.ShapeDtypeStruct((R, S), f32),                      # d_z
        ]
        out_specs += [
            tile_spec((T, 8), lambda i: (i, 0)),
            tile_spec((T, 8), lambda i: (i, 0)),
            tile_spec((T, S), lambda i: (i, 0)),
        ]
    out_shape += [
        jax.ShapeDtypeStruct((R, cfg.shape_blocks, W), bf16),       # d_sproj
        jax.ShapeDtypeStruct((R, cfg.texture_blocks, W), bf16),     # d_tproj
        jax.ShapeDtypeStruct((R, W), bf16),                         # d_vcontrib
    ]
    out_specs += [
        tile_spec((T, cfg.shape_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, cfg.texture_blocks, W), lambda i: (i, 0, 0)),
        tile_spec((T, W), lambda i: (i, 0)),
    ]
    if weight_grads:
        for name, wshape, bshape in names:
            out_shape += [jax.ShapeDtypeStruct(wshape, f32),
                          jax.ShapeDtypeStruct(bshape, f32)]
            out_specs += [const_spec(wshape), const_spec(bshape)]

    # FLOPs: ~3x the forward (recompute + dx + dW chains); the dW chain —
    # one of the three W-square matmuls per layer — is absent in
    # codes-only mode.
    flops_per_tile = (3 if weight_grads else 2) * 2 * P * W * (
        64 + W * (cfg.shape_blocks + 1 + 1 + cfg.texture_blocks) + W // 2
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, S, weight_grads, input_grads),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * n_tiles,
            bytes_accessed=R * S * (64 * 2 + 8 * 4 + 64 * 2),
            transcendentals=R * S,
        ),
        # The default 16 MB scoped-vmem guardrail (not the physical 128 MB)
        # caps the tile at 8 rays; 16-ray tiles measure 17.2 MB of kernel
        # stack and are safely under the hardware budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT_BYTES),
    )(ro8, vd8, z, sproj, tproj, vcontrib, *g_planes, *pe_ops, *wops)
    return outs


def _plane_fwd(cfg: NetConfig, ro8, vd8, z, sproj, tproj, vcontrib,
               *wflat):
    """Shared forward of every plane-op variant: cast the 2-D weights to
    bf16 once in XLA and run the forward kernel."""
    R, S = z.shape
    wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x for x in wflat]
    return fused_mlp.invoke_fwd(cfg, S, R, ro8, vd8, z, sproj, tproj,
                                vcontrib, wb)


def _make_plane_op(cfg: NetConfig, weight_grads: bool, input_grads: bool):
    """One custom-VJP factory for every plane-op variant: the backward
    kernel computes exactly the cotangents the mode needs
    (``weight_grads``/``input_grads``) and the rest are returned as zeros
    — XLA dead-code-eliminates them at the consumers."""

    @jax.custom_vjp
    def op(ro8, vd8, z, sproj, tproj, vcontrib, *wflat):
        return _plane_fwd(cfg, ro8, vd8, z, sproj, tproj, vcontrib, *wflat)

    def fwd_rule(ro8, vd8, z, sproj, tproj, vcontrib, *wflat):
        out = _plane_fwd(cfg, ro8, vd8, z, sproj, tproj, vcontrib, *wflat)
        return out, (ro8, vd8, z, sproj, tproj, vcontrib, wflat)

    def bwd_rule(res, g):
        ro8, vd8, z, sproj, tproj, vcontrib, wflat = res
        R, S = z.shape
        g_planes = tuple(x.astype(jnp.float32) for x in g)
        outs = list(_invoke_bwd(
            cfg, S, R, ro8, vd8, z, sproj, tproj, vcontrib, wflat, g_planes,
            weight_grads=weight_grads, input_grads=input_grads))
        if input_grads:
            d_ro8, d_vd8, d_z = outs[:3]
            outs = outs[3:]
        else:
            d_ro8, d_vd8, d_z = (jnp.zeros_like(ro8), jnp.zeros_like(vd8),
                                 jnp.zeros_like(z))
        d_sproj, d_tproj, d_vcontrib = outs[:3]
        d_w = outs[3:] if weight_grads else [jnp.zeros_like(w)
                                             for w in wflat]
        return (d_ro8, d_vd8, d_z, d_sproj, d_tproj, d_vcontrib, *d_w)

    op.defvjp(fwd_rule, bwd_rule)
    return op


def _with_composite(plane_op, white_bg: bool):
    """Chain a plane op into the fat-tile Pallas composite: the op's
    boundary becomes a single per-ray ``(R, 8)`` f32 array
    ``[r | g | b | depth | acc | pad]``, so the loss talks to it purely
    per-ray and no (R, S) COTANGENT plane is ever built by XLA. Composite
    math matches ``core/render.py::composite`` (reference
    ``src/utils.py:34-47``). Coarse-only paths only — hierarchical
    sampling needs the weights plane."""
    from codenerf_tpu.ops.pallas_composite import make_composite_op

    comp_op = make_composite_op(white_bg=white_bg)

    def op(ro8, vd8, z, sproj, tproj, vcontrib, *wflat):
        sig, r, g, b = plane_op(ro8, vd8, z, sproj, tproj, vcontrib, *wflat)
        return comp_op(sig, r, g, b, z)

    return op


def make_fused_train_op(cfg: NetConfig, input_grads: bool = True):
    """The TRAINING plane op: full weight gradients.

    Returns ``op(ro8, vd8, z, sproj, tproj, vcontrib, *wflat) ->
    (sigma, r, g, b)`` — four (R, S) f32 planes — where ro8/vd8 are (R, 8)
    f32 zero-padded ray origins/directions, z is (R, S) f32 depths (xyz
    expansion and PE run in-kernel), sproj/tproj are (R, blocks, W) bf16,
    vcontrib is (R, W) bf16 and wflat is the f32 list from
    :func:`flatten_params_f32`.

    ``input_grads=False`` drops the ro/vd/z cotangent chain in-kernel (the
    enc_xyz dx matmul, the PE Jacobian and the xyz reductions) — correct
    whenever rays and depths are non-trainable, which is every TRAINING
    step (rays come from the batch poses, z from the sampler RNG)."""
    return _make_plane_op(cfg, weight_grads=True, input_grads=input_grads)


def make_fused_codes_op(cfg: NetConfig):
    """Codes-only plane op for TEST-TIME optimization: the backward kernel
    computes cotangents ONLY for the per-ray code operands (sproj, tproj,
    vcontrib) — the model is frozen in this phase (reference
    ``src/optimizer.py:195-198``), so the dW accumulation (one of the
    three W-square matmuls per layer, plus the f32 W×W VMEM accumulator
    blocks) and the enc_xyz/PE/xyz input chain are skipped in-kernel."""
    return _make_plane_op(cfg, weight_grads=False, input_grads=False)


def make_fused_pose_op(cfg: NetConfig):
    """Frozen-model plane op with INPUT gradients for POSE optimization:
    pose refinement differentiates through ray origins/directions (and z,
    which tracks the refined pose through the per-ray sphere bounds) plus
    the codes, but never through the weights (CodeNeRF §4.3)."""
    return _make_plane_op(cfg, weight_grads=False, input_grads=True)


def make_fused_train_composite_op(cfg: NetConfig, white_bg: bool = True,
                                  input_grads: bool = True):
    """Training plane op chained into the fat-tile composite. (Round-2
    measurement: running the composite inside the 16-ray MLP tiles as a
    SEPARATE-backward op was 5 ms/step slower — the single-pass
    ``_train_kernel`` supersedes this for the coarse-only training loss;
    this op remains the building block for tests and non-loss uses.)"""
    return _with_composite(make_fused_train_op(cfg, input_grads=input_grads),
                           white_bg)


def make_fused_codes_composite_op(cfg: NetConfig, white_bg: bool = True):
    """Codes-only plane op chained into the fat-tile composite — the
    coarse-only codes-optimization loss path."""
    return _with_composite(make_fused_codes_op(cfg), white_bg)


def fused_apply_train(
    params,
    cfg: NetConfig,
    ray_o: jnp.ndarray,        # (R, 3)
    viewdir: jnp.ndarray,      # (R, 3)
    z_vals: jnp.ndarray,       # (R, S)
    shape_code: jnp.ndarray,   # (R, D) or (D,)
    texture_code: jnp.ndarray,
    op=None,
):
    """Differentiable ray-native MLP evaluation using the fused kernels:
    returns ``(sigmas (R, S) f32, (r, g, b) planes each (R, S) f32)`` —
    feed the plane tuple straight to ``core.render.composite``. The
    surrounding per-ray math (viewdir PE, code projections, weight split)
    is plain XLA, so jax.grad flows to params, codes, rays and z."""
    ro8, vd8, z_vals, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
        params, cfg, ray_o, viewdir, z_vals, shape_code, texture_code)
    wflat = flatten_params_f32(params, cfg)
    if op is None:
        op = make_fused_train_op(cfg)
    sigmas, r, g, b = op(ro8, vd8, z_vals, sproj, tproj, vcontrib, *wflat)
    return sigmas, (r, g, b)


def fused_render_train(
    params,
    cfg: NetConfig,
    ray_o: jnp.ndarray,        # (R, 3)
    viewdir: jnp.ndarray,      # (R, 3)
    z_vals: jnp.ndarray,       # (R, S)
    shape_code: jnp.ndarray,   # (R, D) or (D,)
    texture_code: jnp.ndarray,
    op=None,
    white_bg: bool = True,
):
    """Differentiable fully-Pallas render: the plane MLP kernels chained
    into the fat-tile composite kernel (ops/pallas_composite.py). Returns a
    ``core.render.RenderOutput`` whose rgb/depth/acc come straight out of
    the kernels (``weights`` is None — coarse-only training doesn't need
    the plane, and not emitting it is the point)."""
    from codenerf_tpu.core.render import RenderOutput

    ro8, vd8, z_vals, sproj, tproj, vcontrib = fused_mlp.prep_ray_operands(
        params, cfg, ray_o, viewdir, z_vals, shape_code, texture_code)
    wflat = flatten_params_f32(params, cfg)
    if op is None:
        op = make_fused_train_composite_op(cfg, white_bg=white_bg)
    out8 = op(ro8, vd8, z_vals, sproj, tproj, vcontrib, *wflat)
    return RenderOutput(rgb=out8[:, :3], depth=out8[:, 3], acc=out8[:, 4],
                        weights=None)
