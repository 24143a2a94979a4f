"""Fully-fused, RAY-NATIVE CodeNeRF MLP forward as a Pallas TPU kernel.

The kernel takes (origins, directions, z-samples) per ray tile and emits
four (rays, samples) channel planes — the xyz expansion and the xyz
positional encoding happen IN-KERNEL, so nothing (R·S, small)-shaped is
ever materialized in HBM (round-2 measurement: PE materialization cost
~14 ms and the (R·S, k) relayouts ~20 ms of a 76 ms training step at 16K
rays x 96 samples). All weights (~0.7 MB bf16 — the entire 715K-param MLP)
stay VMEM-resident; per-tile activations never leave VMEM.

Division of labor (chosen for MXU/VPU fit, not convenience):
- OUTSIDE (XLA, O(rays) only): per-ray code projections
  ``relu(W_z @ code + b)`` (R, W); the per-ray viewdir contribution
  ``PE(vd) @ W_v + b`` — splitting enc_viewdir's (W+27, W) weight into a
  per-point (W, W) part and a per-RAY (27, W) part removes the (R·S, 283)
  concat entirely (the viewdir term is constant along a ray);
- INSIDE (Pallas): xyz = ro + vd·z, the 64-lane positional encoding
  (t = xyz8 @ A, then masked sin/cos), the seven (P, 256)x(256, 256)-class
  matmuls per tile, additive code injection, ReLUs, Softplus.

This forward runs at ~121 TF/s standalone (v5e, flagship config); for
EVAL-only rendering plain XLA still wins (~143 TF/s — it fuses bias+ReLU
into the matmuls and pipelines inter-layer HBM traffic well), so the
renderer keeps the XLA path by default. Where this kernel earns its keep
is as the forward half of the fused TRAINING op (ops/fused_train.py),
where the ray-native boundary eliminates the glue that dominated the XLA
step. Layer semantics match ``apply_codenerf`` bit-for-bit up to bf16
rounding (tested against it in tests/test_fused.py).

Reference architecture being fused: ``src/model.py:36-53``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from codenerf_tpu.config import NetConfig
from codenerf_tpu.core.encoding import positional_encoding

# 32 rays x 96 samples = 3072 points/tile; the 16 MB scoped-vmem limit is
# a guardrail (not physical VMEM) and is raised per-kernel below, so larger
# tiles compile — 32 remains the measured sweet spot for the forward.
_TILE_RAYS = 32
_FWD_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def fused_available(cfg: NetConfig, n_rays: int, n_samples: int) -> bool:
    """The kernel supports the standard architecture family: W a multiple
    of 256 (so the rgb-hidden width W/2 is a 128-lane multiple), and a ray
    count divisible by the tile."""
    return (
        cfg.W % 128 == 0
        and (cfg.W // 2) % 128 == 0
        and cfg.d_xyz <= 64   # PE input is padded to 64 lanes
        and n_rays % _TILE_RAYS == 0
        and (_TILE_RAYS * n_samples) % 16 == 0
    )


def _pad_lanes(x: jnp.ndarray, to: int) -> jnp.ndarray:
    pad = to - x.shape[-1]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )


def _pe_consts(num_freqs: int):
    """Constants for IN-KERNEL positional encoding of 3-D points into 64
    lanes: ``t = xyz8 @ A`` (frequency scaling, channel order of
    ``core.encoding.positional_encoding`` = the reference ``src/model.py:4-7``:
    [x | sin block, frequency-major | cos block]), then
    ``pe = m_id*t + m_sin*sin(t) + m_cos*cos(t)`` — padding lanes all-zero.

    Why in-kernel: materializing PE in HBM for the kernels costs ~14 ms at
    16K rays x 96 samples (measured — (R*S, 63) f32 round-trips dominate);
    recomputed per-tile it is ~200M VPU transcendentals, well under 1 ms.
    """
    import numpy as np

    F = num_freqs
    A = np.zeros((8, 64), np.float32)
    m_id = np.zeros((64,), np.float32)
    m_sin = np.zeros((64,), np.float32)
    m_cos = np.zeros((64,), np.float32)
    for c in range(3 + 6 * F):
        if c < 3:
            A[c, c] = 1.0
            m_id[c] = 1.0
        elif c < 3 + 3 * F:
            i, d = divmod(c - 3, 3)
            A[d, c] = 2.0 ** i
            m_sin[c] = 1.0
        else:
            i, d = divmod(c - 3 - 3 * F, 3)
            A[d, c] = 2.0 ** i
            m_cos[c] = 1.0
    return A, m_id, m_sin, m_cos


def pe_const_operands(num_freqs: int):
    """The four PE constant arrays as jnp operands (Pallas kernels cannot
    capture array constants — they enter as tiny VMEM inputs)."""
    return [jnp.asarray(x) for x in _pe_consts(num_freqs)]


def _pe_in_kernel(xyz8, A, m_id, m_sin, m_cos):
    """(P, 8) f32 -> ((P, 64) f32 pe, (P, 64) f32 t). ``t`` is returned for
    the backward pass (dpe/dt needs sin/cos of the same arguments)."""
    t = jax.lax.dot_general(
        xyz8, A, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pe = m_id * t + m_sin * jnp.sin(t) + m_cos * jnp.cos(t)
    return pe, t


# ---------------------------------------------------------------------------
# IN-KERNEL volume rendering (composite + white background).
#
# The exclusive cumulative transmittance T_i = prod_{j<i}(1-a_j+1e-10) is
# computed in LOG space with a strictly-triangular (S, S) matmul — the
# MXU-native spelling of an exclusive cumsum (Mosaic has no lane-axis
# cumprod, and XLA's cumprod lowering is the slow part of the composite;
# S=96 makes the matrix tiny). All masks/selector matrices are built from
# iotas in-kernel, so no extra operands are needed. Math matches
# ``core/render.py::composite`` (reference ``src/utils.py:34-47``) to f32
# log/exp rounding.
# ---------------------------------------------------------------------------


def _dotf(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dotf_t(x, w):  # contract x's lanes with w's SECOND axis (x @ w^T)
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def composite_fwd_in_kernel(sig, c0, c1, c2, z, white_bg):
    """All inputs (T, S) f32. Returns ``(out8 (T, 8) f32, aux)`` with
    out8 = [r | g | b | depth | acc | 0 0 0] per ray; aux carries the
    intermediates the backward helper reuses."""
    T, S = z.shape
    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    M = (row < col).astype(f32)        # L @ M = exclusive cumsum of L
    Sh = (row == col + 1).astype(f32)  # z @ Sh = z shifted left (z_{i+1})
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)

    z_next = _dotf(z, Sh)
    delta = jnp.where(lane < S - 1, z_next - z, 1e10)
    e = jnp.exp(-sig * delta)          # = 1 - alpha
    a = 1.0 - e
    u = e + 1e-10                      # cumprod operand, reference 1e-10 floor
    Tacc = jnp.exp(_dotf(jnp.log(u), M))
    w = a * Tacc                       # compositing weights

    colsel = jax.lax.broadcasted_iota(jnp.int32, (S, 8), 1)
    E = lambda k: (colsel == k).astype(f32)
    out8 = (_dotf(w * c0, E(0)) + _dotf(w * c1, E(1)) + _dotf(w * c2, E(2))
            + _dotf(w * z, E(3)) + _dotf(w, E(4)))
    if white_bg:
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (T, 8), 1)
        ones3 = jnp.where(lane8 < 3, 1.0, 0.0)
        acc3 = _dotf(w, E(0) + E(1) + E(2))
        out8 = out8 + ones3 - acc3
    aux = (delta, e, u, Tacc, w, M, Sh, lane)
    return out8, aux


def composite_bwd_in_kernel(sig, c0, c1, c2, z, g8, aux, white_bg):
    """Backward of :func:`composite_fwd_in_kernel` given the per-ray
    cotangent ``g8 (T, 8)``. Returns ``(gsig, gc0, gc1, gc2, dz)`` — the
    (T, S) f32 cotangents of the sigma plane, the three rgb planes and the
    depth samples (the composite's own dz term; the caller adds the xyz
    expansion term)."""
    delta, e, u, Tacc, w, M, Sh, lane = aux
    S = z.shape[1]
    gr, gg, gb = g8[:, 0:1], g8[:, 1:2], g8[:, 2:3]   # (T, 1)
    gd, ga = g8[:, 3:4], g8[:, 4:5]
    resid = ga - (gr + gg + gb if white_bg else 0.0)  # white bg: d acc
    dw = gr * c0 + gg * c1 + gb * c2 + gd * z + resid
    # dT_i = a_i dw_i; dC_i = T_i dT_i = w_i dw_i; dL_j = sum_{i>j} dC_i
    dL = _dotf_t(w * dw, M)
    dx = e * (Tacc * dw - dL / u)      # x = sig * delta
    gsig = dx * delta
    ddelta = jnp.where(lane < S - 1, dx * sig, 0.0)
    # delta_i = z_{i+1} - z_i  =>  dz_i = ddelta_{i-1} - ddelta_i
    dz = gd * w + _dotf_t(ddelta, Sh) - ddelta
    return gsig, w * gr, w * gg, w * gb, dz


def composite_fwd_dual_in_kernel(sig, c0, c1, c2, z, cdelta, cmask,
                                 white_bg):
    """FINE (full union) and COARSE (masked subset) composites in ONE set
    of ROW-STACKED ops.

    The dual-composite hierarchical training kernel evaluates the MLP once
    at the union of coarse+fine depths and computes BOTH losses from that
    one evaluation (ops/fused_train._train_kernel). Matmul rows and
    elementwise lanes are independent, so stacking the two composites'
    operand planes along the ray axis — ``[fine; coarse]`` (2T, S) — gives
    each half bitwise the result of running it alone while paying ONE op
    sequence instead of two. That matters because the in-tile composite is
    Mosaic-serialization-bound, not FLOPs-bound: a separate masked
    composite measured +19.2 ms/step at 16K rays x 128, nearly cancelling
    the 18.9 ms the dual recipe saves upstream.

    Fine rows use consecutive-union deltas computed from ``z`` (terminal
    1e10) and the reference's unconditional 1e-10 cumprod floor — exactly
    :func:`composite_fwd_in_kernel`. Coarse rows use ``cdelta``
    (consecutive-COARSE deltas at coarse positions, terminal coarse delta
    1e10 per reference ``src/utils.py:36``, 0 at fine positions) and a
    floor masked to ``cmask`` (1.0 at coarse positions): fine positions
    get alpha = 1 - exp(0) = 0 and a cumprod factor of EXACTLY 1.0, so
    they contribute nothing — the coarse half equals compositing the
    coarse samples alone, up to f32 summation grouping in the (S, S)
    matmuls.

    All inputs (T, S) f32; returns ``(out8_fine (T, 8), out8_coarse
    (T, 8), aux)``."""
    T, S = z.shape
    f32 = jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    M = (row < col).astype(f32)        # L @ M = exclusive cumsum of L
    Sh = (row == col + 1).astype(f32)  # z @ Sh = z shifted left (z_{i+1})
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)

    z_next = _dotf(z, Sh)
    delta_f = jnp.where(lane < S - 1, z_next - z, 1e10)
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    delta2 = cat(delta_f, cdelta)                       # (2T, S)
    floor2 = cat(jnp.ones_like(cmask), cmask)
    sig2, z2 = cat(sig, sig), cat(z, z)
    c02, c12, c22 = cat(c0, c0), cat(c1, c1), cat(c2, c2)

    e = jnp.exp(-sig2 * delta2)        # = 1 - alpha
    a = 1.0 - e
    u = e + 1e-10 * floor2             # cumprod operand
    Tacc = jnp.exp(_dotf(jnp.log(u), M))
    w = a * Tacc                       # coarse rows: 0 at fine positions

    colsel = jax.lax.broadcasted_iota(jnp.int32, (S, 8), 1)
    E = lambda k: (colsel == k).astype(f32)
    out8 = (_dotf(w * c02, E(0)) + _dotf(w * c12, E(1))
            + _dotf(w * c22, E(2)) + _dotf(w * z2, E(3)) + _dotf(w, E(4)))
    if white_bg:
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (2 * T, 8), 1)
        ones3 = jnp.where(lane8 < 3, 1.0, 0.0)
        acc3 = _dotf(w, E(0) + E(1) + E(2))
        out8 = out8 + ones3 - acc3
    aux = (delta2, e, u, Tacc, w, M)
    return out8[:T], out8[T:], aux


def composite_bwd_dual_in_kernel(c0, c1, c2, z, g8f, g8c, aux, white_bg):
    """Backward of :func:`composite_fwd_dual_in_kernel` given the fine and
    coarse per-ray cotangents ``g8f``/``g8c`` (T, 8). Returns ``(gsig,
    gc0, gc1, gc2)`` — the (T, S) f32 SUMS of both composites' cotangents
    on the union planes (the dual kernel's backward chain consumes exactly
    that sum). Row-stacked like the forward: one op sequence serves both
    halves, each bitwise its standalone result before the final add. No
    dz: the dual mode is training-only, and a training step never
    differentiates through depths."""
    delta2, e, u, Tacc, w, M = aux
    T = z.shape[0]
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    g8 = cat(g8f, g8c)                                # (2T, 8)
    gr, gg, gb = g8[:, 0:1], g8[:, 1:2], g8[:, 2:3]   # (2T, 1)
    gd, ga = g8[:, 3:4], g8[:, 4:5]
    resid = ga - (gr + gg + gb if white_bg else 0.0)  # white bg: d acc
    dw = (gr * cat(c0, c0) + gg * cat(c1, c1) + gb * cat(c2, c2)
          + gd * cat(z, z) + resid)
    dL = _dotf_t(w * dw, M)
    dx = e * (Tacc * dw - dL / u)      # x = sig2 * delta2
    gsig = dx * delta2
    gc0, gc1, gc2 = w * gr, w * gg, w * gb
    half = lambda x: x[:T] + x[T:]
    return half(gsig), half(gc0), half(gc1), half(gc2)


def _kernel(cfg: NetConfig, S: int, sigma_only: bool,
            ro_ref, vd_ref, z_ref, sproj_ref, tproj_ref, vcontrib_ref,
            peA_ref, peid_ref, pesin_ref, pecos_ref,
            *refs):
    """One grid step = one TILE-ray tile (P = TILE*S points).

    ``sigma_only=True`` stops after the sigma head (single (T, S) output;
    the viewdir/texture/rgb branch — ~40% of the forward FLOPs — never
    runs). This is the coarse pass of fused hierarchical training: only
    the compositing WEIGHTS are needed to drive ``sample_pdf``, and
    weights are a function of sigma and z alone; the coarse LOSS is
    computed by the fine kernel's dual composite (ops/fused_train.py).
    The weight operand list is unchanged (texture weights unused).

    The ray->sample expansion (xyz = ro + vd*z) and the positional
    encoding both run in-kernel: every input and output keeps the
    (rays, samples)-shaped layout that the rest of the step uses, so no
    (R*S, small)-shaped tensor is ever materialized in HBM (those
    relayouts measured ~20 ms/step at flagship sizes).

    refs layout: [w_enc, b_enc, (w_shape_j, b_shape_j)*, w_encs, b_encs,
                  w_sig, b_sig, w_encv, b_encv, (w_tex_j, b_tex_j)*,
                  w_rgbh, b_rgbh, w_rgbo, b_rgbo,
                  sig_out, r_out, g_out, b_out]   # (T, S) f32 each

    (Volume rendering deliberately does NOT run here: composing it
    per-16/32-ray tile serializes small (S, S) matmuls between the big
    layer matmuls — measured +5 ms/step vs the separate fat-tile
    composite kernel in ops/pallas_composite.py.)
    """
    import jax.nn as jnn

    n_out = 1 if sigma_only else 4
    out_refs = refs[-n_out:]
    it = iter(refs[:-n_out])
    nxt = lambda: next(it)[...]

    P = _TILE_RAYS * S
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def inject(y, z_tile):
        # y (P, W) += per-ray z (TILE, W), broadcast over the S samples of
        # each ray: reshape through (TILE, S, W).
        yr = y.reshape(_TILE_RAYS, S, cfg.W)
        return (yr + z_tile[:, None, :]).reshape(P, cfg.W)

    ro = ro_ref[...]      # (T, 8) f32, zero-padded origins
    vd = vd_ref[...]      # (T, 8) f32, zero-padded unit directions
    z = z_ref[...]        # (T, S) f32 depth samples
    xyz8 = (ro[:, None, :] + vd[:, None, :] * z[:, :, None]).reshape(P, 8)
    pe_f32, _ = _pe_in_kernel(xyz8, peA_ref[...], peid_ref[...],
                              pesin_ref[...], pecos_ref[...])
    pe = pe_f32.astype(bf16)  # (P, 64)
    sproj = sproj_ref[...]
    tproj = tproj_ref[...]
    vcontrib = vcontrib_ref[...]
    w, b = nxt(), nxt()
    y = jnn.relu(dot(pe, w) + b).astype(bf16)
    for j in range(cfg.shape_blocks):
        w, b = nxt(), nxt()
        y = inject(y, sproj[:, j, :])
        y = jnn.relu(dot(y, w) + b).astype(bf16)
    w, b = nxt(), nxt()
    y = (dot(y, w) + b).astype(bf16)  # enc_shape, no activation
    w_sig, b_sig = nxt(), nxt()       # (W,) row vector, (1,)
    sigma = jnn.softplus(
        jnp.sum(y.astype(f32) * w_sig[None, :], axis=-1) + b_sig[0]
    )  # (P,) f32
    if sigma_only:
        out_refs[0][...] = sigma.reshape(_TILE_RAYS, S)
        return

    w, b = nxt(), nxt()  # enc_viewdir point-part (W, W)
    y = dot(y, w) + b
    y = jnn.relu(
        y.reshape(_TILE_RAYS, S, cfg.W) + vcontrib[:, None, :]
    ).reshape(P, cfg.W).astype(bf16)
    for j in range(cfg.texture_blocks):
        w, b = nxt(), nxt()
        y = inject(y, tproj[:, j, :])
        y = jnn.relu(dot(y, w) + b).astype(bf16)
    w, b = nxt(), nxt()
    y = jnn.relu(dot(y, w) + b).astype(bf16)  # rgb hidden (P, W/2)
    w_rgb, b_rgb = nxt(), nxt()               # (W/2, 8), (8,) zero-padded
    rgb = dot(y, w_rgb) + b_rgb               # (P, 8) f32

    T = _TILE_RAYS
    rgb3 = rgb.reshape(T, S, 8)
    sig_out, r_out, g_out, b_out = out_refs
    sig_out[...] = sigma.reshape(T, S)
    r_out[...] = rgb3[:, :, 0]
    g_out[...] = rgb3[:, :, 1]
    b_out[...] = rgb3[:, :, 2]


def prep_ray_operands(params, cfg: NetConfig, ray_o, viewdir, z_vals,
                      shape_code, texture_code):
    """Per-RAY XLA precompute shared by the forward-only and training fused
    paths (everything per-POINT — xyz expansion, PE — runs in-kernel):
    lane-padded origins/directions, f32 z, per-ray code projections, and
    the per-ray viewdir contribution from the enc_viewdir weight split
    (rows [:W] act on the trunk in-kernel, rows [W:] on PE(viewdir) here;
    the bias rides the per-ray part). All of it is differentiable XLA."""
    bf16 = jnp.bfloat16
    R = z_vals.shape[0]
    if shape_code.ndim == 1:
        shape_code = jnp.broadcast_to(shape_code, (R, shape_code.shape[-1]))
    if texture_code.ndim == 1:
        texture_code = jnp.broadcast_to(
            texture_code, (R, texture_code.shape[-1]))

    ro8 = _pad_lanes(ray_o.astype(jnp.float32), 8)
    vd8 = _pad_lanes(viewdir.astype(jnp.float32), 8)
    z_vals = z_vals.astype(jnp.float32)
    vd_pe = positional_encoding(viewdir, cfg.num_dir_freq)   # (R, 27)

    def ray_proj(prefix, code, blocks):
        outs = []
        for j in range(blocks):
            p = params[f"{prefix}_{j}"]
            outs.append(jax.nn.relu(
                jnp.dot(code.astype(bf16), p["w"].astype(bf16),
                        preferred_element_type=jnp.float32) + p["b"]
            ).astype(bf16))
        return jnp.stack(outs, axis=1)  # (R, blocks, W)

    sproj = ray_proj("shape_latent", shape_code, cfg.shape_blocks)
    tproj = ray_proj("texture_latent", texture_code, cfg.texture_blocks)
    w_encv = params["enc_viewdir"]["w"]
    vcontrib = (
        jnp.dot(vd_pe.astype(bf16), w_encv[cfg.W:].astype(bf16),
                preferred_element_type=jnp.float32)
        + params["enc_viewdir"]["b"]
    ).astype(bf16)  # (R, W)
    return ro8, vd8, z_vals, sproj, tproj, vcontrib


def fused_codenerf_apply(
    params,
    cfg: NetConfig,
    ray_o: jnp.ndarray,      # (R, 3)
    viewdir: jnp.ndarray,    # (R, 3)
    z_vals: jnp.ndarray,     # (R, S) depth samples
    shape_code: jnp.ndarray,    # (R, D) or (D,)
    texture_code: jnp.ndarray,  # (R, D) or (D,)
) -> Tuple[jnp.ndarray, tuple]:
    """Ray-native fused forward (bfloat16 compute, forward-only): takes
    rays + depth samples directly (xyz expansion and PE in-kernel).
    Returns (sigmas (R, S) f32, (r, g, b) planes each (R, S) f32) — the
    plane form composites without any lanes-3 array (core/render.py)."""
    R, S = z_vals.shape[0], z_vals.shape[1]
    if not fused_available(cfg, R, S):
        raise ValueError(
            f"fused kernel unsupported for W={cfg.W}, R={R}, S={S}"
        )
    ro8, vd8, z_vals, sproj, tproj, vcontrib = prep_ray_operands(
        params, cfg, ray_o, viewdir, z_vals, shape_code, texture_code)

    # Weight operands: the SAME positional list as the training op
    # (ops/fused_train.flatten_params_f32 is the single source of truth for
    # order/padding), cast to the kernel dtypes.
    from codenerf_tpu.ops.fused_train import flatten_params_f32

    wb = [x.astype(jnp.bfloat16) if x.ndim == 2 else x
          for x in flatten_params_f32(params, cfg)]

    sigmas, r, g, b = invoke_fwd(cfg, S, R, ro8, vd8, z_vals, sproj, tproj,
                                 vcontrib, wb)
    return sigmas, (r, g, b)


def invoke_fwd(cfg: NetConfig, S: int, R: int, ro8, vd8, z, sproj, tproj,
               vcontrib, wb, sigma_only: bool = False):
    """Run the forward kernel on prepared operands (ro8/vd8: (R, 8) f32
    zero-padded ray origins/directions, z: (R, S) f32 depths; xyz expansion
    and PE happen in-kernel). Returns (sigma, r, g, b) planes, each (R, S)
    f32 — or just the sigma plane when ``sigma_only`` (the texture branch
    never runs; coarse pass of fused hierarchical training). Shared with
    ops/fused_train.py."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = _TILE_RAYS
    n_tiles = R // T
    grid = (n_tiles,)

    def tile_spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    pe_ops = pe_const_operands(cfg.num_xyz_freq)
    in_specs = [
        tile_spec((T, 8), lambda i: (i, 0)),                        # ro8
        tile_spec((T, 8), lambda i: (i, 0)),                        # vd8
        tile_spec((T, S), lambda i: (i, 0)),                        # z
        tile_spec((T, cfg.shape_blocks, cfg.W),
                  lambda i: (i, 0, 0)),                             # sproj
        tile_spec((T, cfg.texture_blocks, cfg.W),
                  lambda i: (i, 0, 0)),                             # tproj
        tile_spec((T, cfg.W), lambda i: (i, 0)),                    # vcontrib
    ] + [
        pl.BlockSpec(c.shape, (lambda nd: lambda i: (0,) * nd)(c.ndim),
                     memory_space=pltpu.VMEM)
        for c in pe_ops
    ] + [
        pl.BlockSpec(w.shape, (lambda nd: lambda i: (0,) * nd)(w.ndim),
                     memory_space=pltpu.VMEM)
        for w in wb
    ]
    n_out = 1 if sigma_only else 4
    out_specs = [tile_spec((T, S), lambda i: (i, 0))] * n_out
    out_shape = [jax.ShapeDtypeStruct((R, S), jnp.float32)] * n_out

    P = T * S
    if sigma_only:
        flops_per_tile = 2 * P * cfg.W * (64 + cfg.W * (cfg.shape_blocks + 1))
    else:
        flops_per_tile = 2 * P * cfg.W * (
            64 + cfg.W * (cfg.shape_blocks + 1 + 1 + cfg.texture_blocks)
            + cfg.W // 2
        )
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, S, sigma_only),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * n_tiles,
            bytes_accessed=(R * S * 5 * 4),
            transcendentals=R * S * (1 + 2 * cfg.num_xyz_freq) * 3,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT_BYTES),
    )(ro8, vd8, z, sproj, tproj, vcontrib, *pe_ops, *wb)
    return outs[0] if sigma_only else outs
