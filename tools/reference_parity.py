#!/usr/bin/env python
"""End-to-end parity A/B against the ACTUAL reference implementation.

The north-star gate is "PSNR within 0.1 dB of the reference on SRN-cars".
Real ShapeNet-SRN is not available on this machine, so this harness measures
the gate on identical synthetic SRN-layout data instead, running BOTH
implementations end to end:

1. Generates a synthetic category (shaded spheres, multi-view-consistent)
   and writes it to disk in the exact SRN directory layout — a train split
   with 50 views/object (the reference hardcodes ``np.random.choice(50, k)``,
   ``src/data.py:72``) and a test split with 250 views/object (the reference
   eval loops ``range(250)``, ``src/optimizer.py:110``).
2. Runs the reference ``Trainer`` + ``Optimizer`` (torch CPU; the CUDA
   device bind at ``src/trainer.py:25`` is patched to CPU, and the missing
   ``skimage`` import is shimmed with this repo's SSIM — same metric is used
   for BOTH sides, so the comparison is apples-to-apples).
3. Runs this framework on the SAME data with matched settings and the
   reference-quirk toggles on (shared z-jitter, per-epoch optimizer-moment
   resets, f32 compute, one ray chunk per step).
4. Reports held-out eval PSNR/SSIM side by side (the reference protocol:
   mean-code init, 200 code-only AdamW steps on view 1, eval on the other
   249 views) and writes ``docs/REFERENCE_PARITY.md``.

Usage:
  python tools/reference_parity.py --workdir /tmp/parity --iters 2000
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
sys.path.insert(0, REPO)


# --------------------------------------------------------------- skimage shim
def _ssim_shim(im1, im2, multichannel=False, **kw):
    """Stand-in for skimage.metrics.structural_similarity as the reference
    calls it (``src/optimizer.py:171``: float images, multichannel=True, no
    data_range — skimage then assumes range 2.0 for float dtypes). Uses this
    repo's JAX SSIM so both sides of the A/B share one metric
    implementation."""
    import jax.numpy as jnp

    from codenerf_tpu.evaluation.metrics import ssim

    return float(ssim(jnp.asarray(np.asarray(im1)), jnp.asarray(np.asarray(im2)),
                      data_range=float(kw.get("data_range", 2.0))))


def _install_skimage_shim() -> bool:
    try:
        import skimage.metrics  # noqa: F401

        return False
    except ImportError:
        pass
    pkg = types.ModuleType("skimage")
    metrics = types.ModuleType("skimage.metrics")
    metrics.structural_similarity = _ssim_shim
    pkg.metrics = metrics
    sys.modules["skimage"] = pkg
    sys.modules["skimage.metrics"] = metrics
    return True


# ------------------------------------------------------------- data generation
def make_dataset(workdir: str, n_train: int, n_test: int, H: int, seed: int,
                 n_eval_views: int = 250):
    from codenerf_tpu.data.synthetic import synthetic_scene, write_srn_layout

    data_root = os.path.join(workdir, "data")
    train = synthetic_scene(n_objects=n_train, n_views=50, H=H, W=H, seed=seed)
    # Held-out objects: same category statistics, disjoint draws. 250 views
    # matches the reference's hardcoded eval loop (``src/optimizer.py:110``);
    # a smaller ``n_eval_views`` (for the flagship-dims A/B, where one CPU
    # eval view costs ~14 s) needs the matching range() patch in
    # :func:`run_reference_eval`.
    test = synthetic_scene(n_objects=n_test, n_views=n_eval_views, H=H, W=H,
                           seed=seed + 1)
    write_srn_layout(data_root, train, cat="srn_cars", splits="cars_train")
    write_srn_layout(data_root, test, cat="srn_cars", splits="cars_test")
    return data_root, train, test


def write_json(workdir: str, data_root: str, scene, n_samples: int,
               net: dict | None = None):
    cfg = {
        "net_hyperparams": net or {
            "shape_blocks": 2, "texture_blocks": 1, "W": 64,
            "num_xyz_freq": 6, "num_dir_freq": 2, "latent_dim": 32,
        },
        "data": {"cat": "srn_cars", "splits": "cars_train",
                 "data_dir": data_root},
        "N_samples": n_samples,
        "near": scene["near"],
        "far": scene["far"],
        "loss_reg_coef": 1e-4,
        "lr_schedule": [
            {"type": "step", "lr": 5e-4, "interval": 1000000},
            {"type": "step", "lr": 5e-3, "interval": 1000000},
        ],
        "check_points": 10000000,
    }
    os.makedirs(os.path.join(workdir, "jsonfiles"), exist_ok=True)
    with open(os.path.join(workdir, "jsonfiles", "parity.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return cfg


# ------------------------------------------------------------- reference side
@contextlib.contextmanager
def _patched_torch_cpu():
    """The reference binds ``torch.device('cuda:<gpu>')`` unconditionally
    (``src/trainer.py:25``); intercept device construction so it runs on the
    CPU install of torch."""
    import torch

    real_device = torch.device

    # Must stay a TYPE: torch internals lazily evaluate annotations like
    # ``str | torch.device`` and isinstance-check against it, so a plain
    # function here breaks unrelated imports.
    class _Meta(type):
        def __instancecheck__(cls, obj):
            return isinstance(obj, real_device)

    class _CpuDevice(metaclass=_Meta):
        def __new__(cls, *args, **kwargs):
            if args and isinstance(args[0], str) and args[0].startswith("cuda"):
                return real_device("cpu")
            return real_device(*args, **kwargs)

    torch.device = _CpuDevice
    try:
        yield
    finally:
        torch.device = real_device


def _ref_modules():
    """Import the reference's flat modules with the DataLoader patched to
    num_workers=0 (worker processes only parallelize image decode; the
    reference rebuilds its DataLoader every epoch, ``src/trainer.py:51``,
    which would respawn 4 procs each time)."""
    _install_skimage_shim()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import trainer as ref_trainer_mod
    import optimizer as ref_optimizer_mod
    from torch.utils.data import DataLoader

    def dl_no_workers(ds, batch_size=1, num_workers=4, shuffle=False):
        return DataLoader(ds, batch_size=batch_size, num_workers=0,
                          shuffle=shuffle)

    ref_trainer_mod.DataLoader = dl_no_workers
    ref_optimizer_mod.DataLoader = dl_no_workers
    return ref_trainer_mod, ref_optimizer_mod


def run_reference_eval(workdir: str, saved_dir: str, num_opts: int,
                       batch_size: int, tgt_view: int, log,
                       impl: str, n_eval_views: int = 250,
                       freeze_weights: bool = False) -> dict:
    """Phase 2 alone — the reference's OWN ``Optimizer`` protocol
    (``src/optimizer.py:48-135``) against whatever ``exps/<saved_dir>/
    models.pth`` holds. With a checkpoint exported by
    ``tools/export_reference_checkpoint.py`` this scores THIS framework's
    weights with zero shared code on the scoring side.

    ``n_eval_views``: the reference hardcodes its per-object eval loop as
    ``for num in range(250)`` (``src/optimizer.py:110``); at flagship dims
    one 64x64 view render costs ~14 s on this single-core CPU, so the
    flagship A/B writes a smaller test split and patches the module-level
    ``range`` so exactly the literal ``range(250)`` resolves to
    ``range(n_eval_views)`` (every other ``range`` call in the module is
    multi-arg). Fewer eval views widens the CI; it cannot bias the A/B —
    both sides score the identical view set.

    ``freeze_weights``: sets ``requires_grad_(False)`` on the loaded model
    parameters before ``optimize_objs``. The reference's AdamW only holds
    the two code vectors (``src/optimizer.py:196-200``), so weight
    gradients are computed and thrown away every opt step; freezing skips
    the dW matmuls without touching the code-gradient chain — verified
    identical (same psnr_eval/ssim_eval to the last float) by
    ``tests/test_reference_parity.py``."""
    _, ref_optimizer_mod = _ref_modules()
    import data as ref_data_mod  # the reference's flat data module

    cwd = os.getcwd()
    os.chdir(workdir)
    t0 = time.time()
    real_range = range
    real_loaders = (ref_data_mod.load_poses, ref_data_mod.load_imgs)
    try:
        if n_eval_views != 250:
            ref_optimizer_mod.range = (
                lambda *a: real_range(n_eval_views) if a == (250,)
                else real_range(*a))
            # ``return_test_val_data`` also hardcodes np.arange(250)
            # (``src/data.py:85``); clip the requested view indices to the
            # views that exist on disk.
            def _clipped(fn):
                def wrapped(path, idxs=[]):
                    idxs = np.asarray(idxs)
                    return fn(path, idxs[idxs < n_eval_views])
                return wrapped

            ref_data_mod.load_poses = _clipped(real_loaders[0])
            ref_data_mod.load_imgs = _clipped(real_loaders[1])
        with _patched_torch_cpu(), contextlib.redirect_stdout(log):
            opt = ref_optimizer_mod.Optimizer(
                saved_dir, gpu=0, instance_ids=[tgt_view], splits="test",
                jsonfile="parity.json", batch_size=batch_size,
                num_opts=num_opts)
            if freeze_weights:
                for p in opt.model.parameters():
                    p.requires_grad_(False)
            opt.optimize_objs([tgt_view], lr=1e-2, lr_half_interval=50,
                              save_img=False)
        opt_s = time.time() - t0
    finally:
        if n_eval_views != 250:
            ref_optimizer_mod.range = real_range
            ref_data_mod.load_poses, ref_data_mod.load_imgs = real_loaders
        os.chdir(cwd)

    per_obj_psnr = {int(k): float(np.mean(v)) for k, v in opt.psnr_eval.items()}
    per_obj_ssim = {int(k): float(np.mean(v)) for k, v in opt.ssim_eval.items()}
    return {
        "impl": impl,
        "per_object_psnr": per_obj_psnr,
        "per_object_ssim": per_obj_ssim,
        "psnr": float(np.mean(list(per_obj_psnr.values()))),
        "ssim": float(np.mean(list(per_obj_ssim.values()))),
        "train_seconds": 0.0,
        "optimize_seconds": opt_s,
    }


def run_reference(workdir: str, iters: int, num_opts: int, batch_size: int,
                  tgt_view: int, log, iters_crop: int = 0,
                  n_eval_views: int = 250,
                  freeze_weights: bool = False) -> dict:
    ref_trainer_mod, _ = _ref_modules()

    cwd = os.getcwd()
    os.chdir(workdir)
    t0 = time.time()
    try:
        with _patched_torch_cpu(), contextlib.redirect_stdout(log):
            tr = ref_trainer_mod.Trainer("ref_run", gpu=0,
                                         jsonfile="parity.json",
                                         batch_size=batch_size)
            tr.training(iters_crop, iters, num_instances_per_obj=1)
        train_s = time.time() - t0
    finally:
        os.chdir(cwd)

    out = run_reference_eval(workdir, "ref_run", num_opts, batch_size,
                             tgt_view, log, "reference (torch CPU)",
                             n_eval_views=n_eval_views,
                             freeze_weights=freeze_weights)
    out["train_seconds"] = train_s
    return out


# ------------------------------------------------------------- framework side
def _framework_hparams(workdir: str, data_root: str, quirks: bool):
    """The A/B's framework-side config: parity.json + f32 compute, plus the
    reference-quirk toggles when ``quirks`` (matched training dynamics:
    shared z-jitter — SURVEY quirk #2; AdamW-moment reset + frozen lr per
    reference epoch = n_objects steps — quirk #3; batch_size == H*W means
    one chunk per step, so the first-chunk-only reg scaling — quirk #4 —
    is 1/1)."""
    from codenerf_tpu.config import hparams_from_dict, load_hparams
    from codenerf_tpu.data.srn import SRNDataset

    hp = load_hparams(os.path.join(workdir, "jsonfiles", "parity.json"))
    raw = dict(hp.raw)
    raw["compute_dtype"] = "float32"
    train_ds = SRNDataset(cat="srn_cars", splits="cars_train",
                          data_dir=data_root)
    if quirks:
        raw["shared_jitter"] = True
        raw["reference_quirks"] = {
            "optimizer_reset_every": train_ds.n_objects,
            "reg_chunk_divisor": 1,
        }
    return hparams_from_dict(raw), train_ds


def _framework_eval(trainables, hp, test_scene, tgt_view: int, num_opts: int,
                    batch_size: int, quirks: bool) -> tuple[dict, dict]:
    """The framework half of the eval protocol: mean-code init, num_opts
    code-only AdamW steps on the target view, PSNR/SSIM over the remaining
    views. Deterministic per-object PRNG keys, so calling this at several
    training budgets scores the SAME protocol each time."""
    import jax

    from codenerf_tpu.models.codes import mean_code
    from codenerf_tpu.optimization.codes_opt import CodeOptimizer

    opt = CodeOptimizer(
        params=trainables["params"], hp=hp,
        mean_shape=mean_code(trainables["shape_codes"]),
        mean_texture=mean_code(trainables["texture_codes"]),
        chunk=min(4096, batch_size),
        reference_resets=quirks,
    )
    images = test_scene["images"].astype(np.float32) / 255.0
    per_obj_psnr, per_obj_ssim = {}, {}
    for oi in range(images.shape[0]):
        key = jax.random.PRNGKey(1000 + oi)
        res = opt.optimize_object(images[oi], test_scene["poses"][oi],
                                  float(test_scene["focals"][oi]),
                                  [tgt_view], key, num_opts=num_opts,
                                  lr=1e-2, lr_half_interval=50)
        ev = opt.evaluate_object(images[oi], test_scene["poses"][oi],
                                 float(test_scene["focals"][oi]),
                                 [tgt_view], res.shape_code,
                                 res.texture_code,
                                 jax.random.PRNGKey(2000 + oi))
        per_obj_psnr[oi] = float(np.mean(ev["psnr"]))
        per_obj_ssim[oi] = float(np.mean(ev["ssim"]))
    return per_obj_psnr, per_obj_ssim


def run_framework(workdir: str, data_root: str, iters: int, num_opts: int,
                  batch_size: int, tgt_view: int, test_scene, log,
                  quirks: bool = True, iters_crop: int = 0,
                  export_pth: str | None = None) -> dict:
    import jax

    from codenerf_tpu.training.trainer import Trainer

    hp, train_ds = _framework_hparams(workdir, data_root, quirks)

    t0 = time.time()
    tr = Trainer(("quirks_run" if quirks else "clean_run"), hp,
                 batch_size=batch_size, dataset=train_ds,
                 exps_root=os.path.join(workdir, "exps"), check_iter=0)
    with contextlib.redirect_stdout(log):
        tr.training(iters_crop=iters_crop, iters_all=iters,
                    log_every=max(iters // 4, 1))
    train_s = time.time() - t0

    trainables = tr.state.trainables
    if export_pth:
        # Reverse-convert the freshly trained weights so the reference's
        # own Optimizer can score them (--cross_eval).
        import torch

        from tools.export_reference_checkpoint import trainables_to_reference

        payload = trainables_to_reference(jax.device_get(trainables),
                                          niter=iters)
        os.makedirs(os.path.dirname(export_pth), exist_ok=True)
        torch.save(payload, export_pth)
    t0 = time.time()
    per_obj_psnr, per_obj_ssim = _framework_eval(
        trainables, hp, test_scene, tgt_view, num_opts, batch_size, quirks)
    opt_s = time.time() - t0
    return {
        "impl": f"codenerf_tpu ({'quirks-matched' if quirks else 'clean'})",
        "per_object_psnr": per_obj_psnr,
        "per_object_ssim": per_obj_ssim,
        "psnr": float(np.mean(list(per_obj_psnr.values()))),
        "ssim": float(np.mean(list(per_obj_ssim.values()))),
        "train_seconds": train_s,
        "optimize_seconds": opt_s,
    }


# ------------------------------------------------------------- budget curves
def run_reference_curve(workdir: str, budgets: list[int], num_opts: int,
                        batch_size: int, tgt_view: int, log,
                        n_eval_views: int = 250) -> list[dict]:
    """Train the reference's own ``Trainer`` ONCE, pausing at each budget to
    run its full eval protocol — the reference side of the margin-vs-budget
    curve. In-process continuation IS the reference's own loop semantics
    (``src/trainer.py:37``: ``while self.niter < iters_all``), and
    ``models.pth`` is rewritten at every epoch end (``src/trainer.py:45``),
    so the eval at budget b scores exactly the b-step weights (budgets must
    be multiples of n_train_objects — epochs advance niter by that much)."""
    ref_trainer_mod, _ = _ref_modules()
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with _patched_torch_cpu(), contextlib.redirect_stdout(log):
            tr = ref_trainer_mod.Trainer("ref_run", gpu=0,
                                         jsonfile="parity.json",
                                         batch_size=batch_size)
    finally:
        os.chdir(cwd)
    points = []
    for b in budgets:
        t0 = time.time()
        os.chdir(workdir)
        try:
            with _patched_torch_cpu(), contextlib.redirect_stdout(log):
                tr.training(0, b, num_instances_per_obj=1)
        finally:
            os.chdir(cwd)
        train_s = time.time() - t0
        pt = run_reference_eval(workdir, "ref_run", num_opts, batch_size,
                                tgt_view, log, f"reference@{b}",
                                n_eval_views=n_eval_views,
                                freeze_weights=True)
        pt["iters"], pt["train_seconds"] = b, train_s
        points.append(pt)
        print(f"  reference @{b}: {pt['psnr']:.2f} dB / {pt['ssim']:.4f} "
              f"(+{train_s:.0f}s train, {pt['optimize_seconds']:.0f}s eval)",
              flush=True)
    return points


def run_framework_curve(workdir: str, data_root: str, budgets: list[int],
                        num_opts: int, batch_size: int, tgt_view: int,
                        test_scene, log, quirks: bool = True) -> list[dict]:
    """Framework side of the margin-vs-budget curve: one Trainer continued
    in-process through the budget list (``Trainer.training`` resumes from
    ``state.step``), full eval protocol at each pause with per-object
    deterministic keys."""
    from codenerf_tpu.training.trainer import Trainer

    hp, train_ds = _framework_hparams(workdir, data_root, quirks)
    tr = Trainer(("quirks_run" if quirks else "clean_run"), hp,
                 batch_size=batch_size, dataset=train_ds,
                 exps_root=os.path.join(workdir, "exps"), check_iter=0)
    points = []
    for b in budgets:
        t0 = time.time()
        with contextlib.redirect_stdout(log):
            tr.training(iters_crop=0, iters_all=b,
                        log_every=max(b // 4, 1))
        train_s = time.time() - t0
        t0 = time.time()
        pp, ps = _framework_eval(tr.state.trainables, hp, test_scene,
                                 tgt_view, num_opts, batch_size, quirks)
        points.append({
            "impl": f"codenerf_tpu@{b}", "iters": b,
            "per_object_psnr": pp, "per_object_ssim": ps,
            "psnr": float(np.mean(list(pp.values()))),
            "ssim": float(np.mean(list(ps.values()))),
            "train_seconds": train_s,
            "optimize_seconds": time.time() - t0,
        })
        pt = points[-1]
        print(f"  ours @{b}: {pt['psnr']:.2f} dB / {pt['ssim']:.4f} "
              f"(+{train_s:.0f}s train, {pt['optimize_seconds']:.0f}s eval)",
              flush=True)
    return points


def write_budget_report(path: str, args, budgets: list[int],
                        per_seed: dict, section: str) -> None:
    """Append the margin-vs-budget section: one table per seed, then the
    terminal-margin summary with an across-seed error bar and the
    reference's final-doubling improvement (the plateau evidence)."""
    lines = [f"## {section}", "",
             f"Generated by `tools/reference_parity.py --budget_curve` on "
             f"{time.strftime('%Y-%m-%d')}. Same miniature A/B protocol as "
             "the seed table above (identical synthetic SRN data per seed; "
             "reference = its own `Trainer`/`Optimizer` on torch CPU, "
             "framework = quirks-matched"
             + (", on the TPU chip — same f32 math"
                if args.ours_platform == "tpu" else "")
             + "). BOTH sides pause at each training budget and are scored "
             f"with the full reference eval protocol (mean-code init, "
             f"{args.num_opts} code-only AdamW steps on view "
             f"{args.tgt_view}, PSNR/SSIM over the remaining "
             f"{args.n_eval_views - 1} views of {args.n_test} held-out "
             "objects).", ""]
    for seed, d in per_seed.items():
        lines += [f"Seed {seed} (held-out PSNR, dB):", "",
                  "| train iters | reference | codenerf_tpu | margin |",
                  "|---|---|---|---|"]
        for rp, op in zip(d["reference"], d["framework"]):
            lines.append(f"| {rp['iters']} | {rp['psnr']:.2f} "
                         f"| {op['psnr']:.2f} "
                         f"| {op['psnr'] - rp['psnr']:+.2f} |")
        lines.append("")
    margins = [d["framework"][-1]["psnr"] - d["reference"][-1]["psnr"]
               for d in per_seed.values()]
    ref_gain = [d["reference"][-1]["psnr"] - d["reference"][-2]["psnr"]
                for d in per_seed.values()]
    ours_gain = [d["framework"][-1]["psnr"] - d["framework"][-2]["psnr"]
                 for d in per_seed.values()]
    lines += [
        f"**Terminal margin at {budgets[-1]} iters: "
        f"{np.mean(margins):+.2f} ± {np.std(margins):.2f} dB over "
        f"{len(per_seed)} seeds.** Final budget doubling "
        f"({budgets[-2]} → {budgets[-1]} iters) moves the reference by "
        f"{np.mean(ref_gain):+.2f} dB and the framework by "
        f"{np.mean(ours_gain):+.2f} dB (seed means).", ""]
    with open(path, "a") as f:
        f.write("\n" + "\n".join(lines))


# --------------------------------------------------------------------- report
def write_report(path: str, args, ref: dict, ours: dict, clean: dict | None,
                 cross: dict | None = None, section: str | None = None):
    """Writes (or, with ``section``, APPENDS a ``## section`` block to) the
    parity report — append mode lets the flagship-dims A/B land next to the
    miniature 3-seed table instead of clobbering it."""
    rows = ([ref, ours] + ([cross] if cross else [])
            + ([clean] if clean else []))
    header = ([f"## {section}"] if section else
              ["# Reference parity — measured end-to-end A/B"])
    lines = header + [
        "",
        f"Generated by `tools/reference_parity.py` on {time.strftime('%Y-%m-%d')}. "
        "Both implementations trained + evaluated on IDENTICAL synthetic "
        "SRN-layout data (no ShapeNet on this machine); the reference ran "
        "its own `Trainer`/`Optimizer` (`src/trainer.py:34-99`, "
        "`src/optimizer.py:48-135`) on torch CPU.",
        "",
        f"Protocol: {args.n_train} train objects x 50 views, {args.n_test} "
        f"held-out objects x {args.n_eval_views} views, "
        f"{args.size}x{args.size} images, "
        f"N_samples={args.n_samples}, W={args.width} latent="
        f"{args.latent_dim} MLP ({args.shape_blocks}+{args.texture_blocks} "
        f"blocks, PE {args.xyz_freq}/{args.dir_freq}), {args.iters} "
        f"train iters"
        + (f" ({args.iters_crop} crop-phase)" if args.iters_crop else "")
        + f" (one {args.size * args.size}-ray image-step each), "
        f"then the reference eval protocol: mean-code init, {args.num_opts} "
        "code-only AdamW steps (lr 1e-2 halved/50) on view "
        f"{args.tgt_view}, PSNR/SSIM over the remaining "
        f"{args.n_eval_views - 1} views. "
        "SSIM for BOTH sides is this repo's skimage-semantics implementation "
        "(data_range=2.0 float quirk included) — skimage itself is not "
        "installed."
        + (" The framework side ran on the TPU chip (same f32 math; the "
           "gate is statistical — see notes)."
           if args.ours_platform == "tpu" else ""),
        "",
        "| implementation | held-out PSNR (dB) | held-out SSIM | train s | opt+eval s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['impl']} | {r['psnr']:.2f} | {r['ssim']:.4f} "
            f"| {r['train_seconds']:.0f} | {r['optimize_seconds']:.0f} |")
    delta = ours["psnr"] - ref["psnr"]
    spread = np.std(list(ref["per_object_psnr"].values()))
    lines += [
        "",
        f"**Delta (quirks-matched − reference): {delta:+.2f} dB PSNR, "
        f"{ours['ssim'] - ref['ssim']:+.4f} SSIM.** Per-object PSNR spread "
        f"(reference, std over {args.n_test} objects): {spread:.2f} dB.",
        "",
        "Per-object held-out PSNR (dB):",
        "",
        "| object | " + " | ".join(r["impl"] for r in rows) + " |",
        "|---|" + "---|" * len(rows),
    ]
    for oi in sorted(ref["per_object_psnr"]):
        lines.append(
            "| " + str(oi) + " | " + " | ".join(
                f"{r['per_object_psnr'][oi]:.2f}" for r in rows) + " |")
    lines += [
        "",
        "Notes:",
        "- The reference's randomness is unseeded (view choice, z-jitter,",
        "  code init — SURVEY §2.3 #11), so exact-match is impossible by",
        "  construction; the gate is statistical equality of the eval",
        "  protocol's PSNR/SSIM.",
        "- Unit-level parity (same weights -> same outputs) is exact and",
        "  checked in `tests/test_reference_parity.py`: model forward,",
        "  rays, sampling, compositing, code gradients, full deterministic",
        "  render (<= 5e-6 absolute).",
        "",
    ]
    mode = "a" if section and os.path.exists(path) else "w"
    with open(path, mode) as f:
        if mode == "a":
            f.write("\n")
        f.write("\n".join(lines))
    return delta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/reference_parity")
    ap.add_argument("--n_train", type=int, default=5)
    ap.add_argument("--n_test", type=int, default=3)
    ap.add_argument("--size", type=int, default=32, help="image H=W")
    ap.add_argument("--n_samples", type=int, default=24)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--iters_crop", type=int, default=0,
                    help="crop-phase iterations (reference center-crop "
                    "schedule, src/data.py:76-78 — the reference hardcodes "
                    "a 32px crop, so this needs --size 128)")
    ap.add_argument("--num_opts", type=int, default=200)
    ap.add_argument("--tgt_view", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_eval_views", type=int, default=250,
                    help="views per held-out object (250 = the reference's "
                    "hardcoded eval loop; smaller patches range(250) — see "
                    "run_reference_eval)")
    ap.add_argument("--freeze_ref_opt", action="store_true",
                    help="freeze model weights during the reference's "
                    "test-time optimization (its AdamW only holds the "
                    "codes; skips dW matmuls, code grads identical — "
                    "equality covered by tests/test_reference_parity.py)")
    ap.add_argument("--only_ref", action="store_true",
                    help="run ONLY the reference side and dump its result "
                    "to <workdir>/ref_result.json (the flagship A/B's "
                    "reference side takes hours on this single core; this "
                    "makes the run resumable)")
    ap.add_argument("--ref_json", default=None,
                    help="load a previously dumped reference result instead "
                    "of re-running it")
    ap.add_argument("--ours_platform", choices=["cpu", "tpu"], default="cpu",
                    help="device for the framework side. cpu = strict "
                    "apples-to-apples with torch CPU; tpu runs the same f32 "
                    "math on the real chip (minutes instead of hours at "
                    "flagship dims — trajectory differences are reduction-"
                    "order-level, far below the per-seed spread)")
    ap.add_argument("--section", default=None,
                    help="APPEND the results as a '## <section>' block to "
                    "the report instead of overwriting it")
    # Flagship architecture knobs (defaults = the round-3 miniature;
    # --flagship switches all four to the shipped srncar.json dims,
    # /root/reference/jsonfiles/srncar.json:2-9).
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--shape_blocks", type=int, default=2)
    ap.add_argument("--texture_blocks", type=int, default=1)
    ap.add_argument("--latent_dim", type=int, default=32)
    ap.add_argument("--xyz_freq", type=int, default=6)
    ap.add_argument("--dir_freq", type=int, default=2)
    ap.add_argument("--flagship", action="store_true",
                    help="the reference's real srncar architecture: W=256, "
                    "3 shape + 1 texture blocks, latent 256, PE 10/4")
    ap.add_argument("--also_clean", action="store_true",
                    help="additionally run this framework WITHOUT the "
                    "reference-quirk toggles (clean formulation)")
    ap.add_argument("--cross_eval", action="store_true",
                    help="export the framework-trained weights to the "
                    "reference's models.pth and run the REFERENCE'S OWN "
                    "Optimizer eval on them — parity with zero shared code "
                    "on the scoring side")
    ap.add_argument("--budget_curve", default=None,
                    help="comma list of training budgets (iters), e.g. "
                    "'600,1200,2400,4800,9600': train BOTH sides once each, "
                    "pausing at every budget for the full eval protocol — "
                    "the margin-vs-budget curve that shows whether the "
                    "reference's PSNR has plateaued (each budget must be a "
                    "multiple of --n_train). Appends a report section and "
                    "writes <workdir>/budget_curve.json")
    ap.add_argument("--curve_seeds", default=None,
                    help="comma list of seeds for --budget_curve (fresh "
                    "scenes + inits per seed; default: just --seed)")
    ap.add_argument("--report", default=os.path.join(REPO, "docs",
                                                     "REFERENCE_PARITY.md"))
    args = ap.parse_args()
    if args.flagship:
        args.width, args.latent_dim = 256, 256
        args.shape_blocks, args.texture_blocks = 3, 1
        args.xyz_freq, args.dir_freq = 10, 4

    # Force CPU for apples-to-apples with torch CPU (also: the axon
    # sitecustomize pins JAX_PLATFORMS, so set it via jax.config in-process).
    # --ours_platform tpu leaves the axon TPU platform in place.
    import jax

    if args.ours_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    net = {
        "shape_blocks": args.shape_blocks,
        "texture_blocks": args.texture_blocks,
        "W": args.width,
        "num_xyz_freq": args.xyz_freq,
        "num_dir_freq": args.dir_freq,
        "latent_dim": args.latent_dim,
    }
    batch = args.size * args.size

    if args.budget_curve:
        budgets = sorted(int(x) for x in args.budget_curve.split(","))
        assert all(b % args.n_train == 0 for b in budgets), (
            "budgets must be multiples of --n_train (the reference trains "
            "in whole epochs of n_train object-steps)")
        seeds = ([int(s) for s in args.curve_seeds.split(",")]
                 if args.curve_seeds else [args.seed])
        per_seed = {}
        for seed in seeds:
            wd = os.path.join(args.workdir, f"seed_{seed}")
            os.makedirs(wd, exist_ok=True)
            data_root, train_scene, test_scene = make_dataset(
                wd, args.n_train, args.n_test, args.size, seed,
                n_eval_views=args.n_eval_views)
            write_json(wd, data_root, train_scene, args.n_samples, net=net)
            with open(os.path.join(wd, "run.log"), "w") as log:
                print(f"[seed {seed}] reference curve (torch CPU)...",
                      flush=True)
                ref_pts = run_reference_curve(
                    wd, budgets, args.num_opts, batch, args.tgt_view, log,
                    n_eval_views=args.n_eval_views)
                print(f"[seed {seed}] framework curve...", flush=True)
                ours_pts = run_framework_curve(
                    wd, data_root, budgets, args.num_opts, batch,
                    args.tgt_view, test_scene, log)
            per_seed[seed] = {"reference": ref_pts, "framework": ours_pts}
        write_budget_report(args.report, args, budgets, per_seed,
                            section=args.section or "Budget-matched parity")
        with open(os.path.join(args.workdir, "budget_curve.json"), "w") as f:
            json.dump({"args": vars(args), "budgets": budgets,
                       "per_seed": per_seed}, f, indent=2)
        margins = [per_seed[s]["framework"][-1]["psnr"]
                   - per_seed[s]["reference"][-1]["psnr"] for s in seeds]
        print(json.dumps({
            "budgets": budgets, "seeds": seeds,
            "terminal_margin_db_mean": float(np.mean(margins)),
            "terminal_margin_db_std": float(np.std(margins)),
            "ref_terminal_psnr": [per_seed[s]["reference"][-1]["psnr"]
                                  for s in seeds],
            "ours_terminal_psnr": [per_seed[s]["framework"][-1]["psnr"]
                                   for s in seeds],
        }))
        return

    data_root, train_scene, test_scene = make_dataset(
        args.workdir, args.n_train, args.n_test, args.size, args.seed,
        n_eval_views=args.n_eval_views)
    write_json(args.workdir, data_root, train_scene, args.n_samples, net=net)
    export_pth = (os.path.join(args.workdir, "exps", "xeval_run",
                               "models.pth") if args.cross_eval else None)

    log_path = os.path.join(args.workdir, "run.log")
    with open(log_path, "w") as log:
        if args.ref_json:
            with open(args.ref_json) as f:
                ref = json.load(f)
            for k in ("per_object_psnr", "per_object_ssim"):
                ref[k] = {int(oi): v for oi, v in ref[k].items()}
            print(f"loaded reference result from {args.ref_json}: "
                  f"{ref['psnr']:.2f} dB / {ref['ssim']:.4f}", flush=True)
        else:
            print("running reference (torch CPU)...", flush=True)
            ref = run_reference(args.workdir, args.iters, args.num_opts,
                                batch, args.tgt_view, log,
                                iters_crop=args.iters_crop,
                                n_eval_views=args.n_eval_views,
                                freeze_weights=args.freeze_ref_opt)
            print(f"  reference: {ref['psnr']:.2f} dB / {ref['ssim']:.4f} "
                  f"(train {ref['train_seconds']:.0f}s)", flush=True)
            ref_path = os.path.join(args.workdir, "ref_result.json")
            with open(ref_path, "w") as f:
                json.dump(ref, f, indent=2)
            if args.only_ref:
                print(f"--only_ref: reference result saved to {ref_path}",
                      flush=True)
                return
        print("running codenerf_tpu (quirks-matched)...", flush=True)
        ours = run_framework(args.workdir, data_root, args.iters,
                             args.num_opts, batch, args.tgt_view,
                             test_scene, log, quirks=True,
                             iters_crop=args.iters_crop,
                             export_pth=export_pth)
        print(f"  ours(quirks): {ours['psnr']:.2f} dB / {ours['ssim']:.4f} "
              f"(train {ours['train_seconds']:.0f}s)", flush=True)
        cross = None
        if args.cross_eval:
            print("running REFERENCE eval on framework-trained weights "
                  "(cross-eval)...", flush=True)
            cross = run_reference_eval(
                args.workdir, "xeval_run", args.num_opts, batch,
                args.tgt_view, log,
                "reference Optimizer scoring codenerf_tpu weights",
                n_eval_views=args.n_eval_views,
                freeze_weights=args.freeze_ref_opt)
            print(f"  cross-eval: {cross['psnr']:.2f} dB / "
                  f"{cross['ssim']:.4f}", flush=True)
        clean = None
        if args.also_clean:
            print("running codenerf_tpu (clean)...", flush=True)
            clean = run_framework(args.workdir, data_root, args.iters,
                                  args.num_opts, batch, args.tgt_view,
                                  test_scene, log, quirks=False,
                                  iters_crop=args.iters_crop)
            print(f"  ours(clean): {clean['psnr']:.2f} dB / "
                  f"{clean['ssim']:.4f}", flush=True)

    delta = write_report(args.report, args, ref, ours, clean, cross,
                         section=args.section)
    out = {
        "reference_psnr": ref["psnr"], "framework_psnr": ours["psnr"],
        "delta_db": delta, "reference_ssim": ref["ssim"],
        "framework_ssim": ours["ssim"],
    }
    if clean:
        out["clean_psnr"] = clean["psnr"]
    if cross:
        out["cross_eval_psnr"] = cross["psnr"]
    with open(os.path.join(args.workdir, "parity.json"), "w") as f:
        json.dump({"args": vars(args), "reference": ref, "framework": ours,
                   "clean": clean, "cross_eval": cross}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
