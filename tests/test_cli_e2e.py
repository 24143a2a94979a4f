"""End-to-end CLI test: train.py then optimize.py against a synthetic
SRN-layout dataset on disk, exercising the full reference workflow
(``README.md:32-47`` usage) — config json -> train -> checkpoint ->
test-time optimization -> metrics files."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from codenerf_tpu.data.synthetic import synthetic_scene, write_srn_layout

    root = tmp_path_factory.mktemp("cli")
    data_dir = str(root / "data")
    scene = synthetic_scene(n_objects=2, n_views=4, H=16, W=16, seed=3)
    write_srn_layout(data_dir, scene, cat="srn_cars", splits="cars_train")
    write_srn_layout(data_dir, scene, cat="srn_cars", splits="cars_test")

    cfg = {
        "net_hyperparams": {
            "shape_blocks": 1, "texture_blocks": 1, "W": 32,
            "num_xyz_freq": 2, "num_dir_freq": 1, "latent_dim": 8,
        },
        "data": {"cat": "srn_cars", "splits": "cars_train",
                 "data_dir": data_dir},
        "N_samples": 8,
        "near": scene["near"],
        "far": scene["far"],
        "loss_reg_coef": 1e-4,
        "lr_schedule": [
            {"type": "step", "lr": 5e-4, "interval": 100000},
            {"type": "step", "lr": 5e-3, "interval": 100000},
        ],
        "check_points": 0,
        "compute_dtype": "float32",
    }
    jsondir = root / "jsonfiles"
    jsondir.mkdir()
    with open(jsondir / "tiny.json", "w") as f:
        json.dump(cfg, f)
    return root


def _run(args, cwd):
    env = dict(os.environ, CODENERF_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )


def test_train_then_optimize_cli(workdir):
    r = _run(
        [os.path.join(REPO, "train.py"), "--save_dir", "run1",
         "--iters_crop", "5", "--iters_all", "40", "--batchsize", "256",
         "--jsonfile", "jsonfiles/tiny.json", "--log_every", "20",
         "--check_iter", "0", "--tensorboard", "false"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    exp = workdir / "exps" / "run1"
    assert (exp / "hpam.json").is_file()
    assert (exp / "metrics.jsonl").is_file()
    assert any((exp / "ckpt").iterdir())

    # resume path: second invocation picks up at step 40 and trains to 45
    r2 = _run(
        [os.path.join(REPO, "train.py"), "--save_dir", "run1",
         "--iters_crop", "5", "--iters_all", "45", "--batchsize", "256",
         "--jsonfile", "jsonfiles/tiny.json", "--log_every", "5",
         "--check_iter", "0"],
        cwd=str(workdir),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from step 40" in r2.stdout, r2.stdout

    r3 = _run(
        [os.path.join(REPO, "optimize.py"), "--saved_dir", "run1",
         "--tgt_instances", "1", "--splits", "test", "--num_opts", "10",
         "--lr", "1e-2", "--lr_half_interval", "5",
         "--jsonfile", "jsonfiles/tiny.json", "--batchsize", "256",
         "--save_img", "true"],
        cwd=str(workdir),
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    test_dir = exp / "test"
    assert test_dir.is_dir()
    codes = np.load(test_dir / "codes.npz")
    assert codes["optimized_shapecodes"].shape == (2, 8)
    with open(test_dir / "results.json") as f:
        results = json.load(f)
    assert len(results["per_object"]) == 2
    assert np.isfinite(results["mean_psnr"])
    assert -1.0 <= results["mean_ssim"] <= 1.0
    # per-view eval excluded the target instance: 4 views - 1 target = 3
    assert all(len(v) == 3 for v in results["psnr_eval"].values())
    # side-by-side images written
    obj_dirs = [d for d in test_dir.iterdir() if d.is_dir()]
    assert obj_dirs and any(list(d.glob("*.png")) for d in obj_dirs)

    # the reference-format torch payload (src/optimizer.py:137-147) is
    # written alongside: same keys, shapes, and values as the native files
    import torch

    ref = torch.load(test_dir / "codes.pth", weights_only=False)
    assert set(ref) == {"ids", "num_obj", "optimized_shapecodes",
                        "optimized_texturecodes", "psnr_eval", "ssim_eval"}
    assert ref["num_obj"] == 1  # last completed object index
    assert list(ref["ids"]) == list(codes["ids"])
    assert isinstance(ref["optimized_shapecodes"], torch.Tensor)
    assert tuple(ref["optimized_shapecodes"].shape) == (2, 8)
    np.testing.assert_allclose(ref["optimized_texturecodes"].numpy(),
                               codes["optimized_texturecodes"], atol=0)
    # per-view metric dicts are keyed by object INDEX like the reference
    assert set(ref["psnr_eval"]) == {0, 1}
    for i, obj_id in enumerate(codes["ids"]):
        np.testing.assert_allclose(ref["psnr_eval"][i],
                                   results["psnr_eval"][obj_id], rtol=1e-6)
        np.testing.assert_allclose(ref["ssim_eval"][i],
                                   results["ssim_eval"][obj_id], rtol=1e-6)

    # a second optimize run gets a numbered dir (reference behavior)
    r4 = _run(
        [os.path.join(REPO, "optimize.py"), "--saved_dir", "run1",
         "--tgt_instances", "1", "--splits", "test", "--num_opts", "2",
         "--jsonfile", "jsonfiles/tiny.json", "--batchsize", "256",
         "--save_img", "false"],
        cwd=str(workdir),
    )
    assert r4.returncode == 0, r4.stderr[-3000:]
    assert (exp / "test_2").is_dir()

    # batched multi-object path (--opt_group): same protocol, same
    # per-object keys -> object-for-object identical artifacts
    r5 = _run(
        [os.path.join(REPO, "optimize.py"), "--saved_dir", "run1",
         "--tgt_instances", "1", "--splits", "test", "--num_opts", "10",
         "--lr", "1e-2", "--lr_half_interval", "5",
         "--jsonfile", "jsonfiles/tiny.json", "--batchsize", "256",
         "--save_img", "false", "--save_progress", "false",
         "--opt_group", "2"],
        cwd=str(workdir),
    )
    assert r5.returncode == 0, r5.stderr[-3000:]
    codes_b = np.load(exp / "test_3" / "codes.npz")
    np.testing.assert_allclose(codes_b["optimized_shapecodes"],
                               codes["optimized_shapecodes"], atol=1e-4)
    with open(exp / "test_3" / "results.json") as f:
        results_b = json.load(f)
    for a, b in zip(results_b["per_object"], results["per_object"]):
        assert a["id"] == b["id"]
        assert abs(a["psnr"] - b["psnr"]) < 0.05
        assert abs(a["ssim"] - b["ssim"]) < 1e-3


def test_ignored_reference_flags_warn(tmp_path):
    """Non-default values of reference-compat flags with different semantics
    here must warn on stderr (they used to be silently ignored). The bogus
    jsonfile makes the process exit fast, after the warnings are printed."""
    r = _run(
        [os.path.join(REPO, "train.py"), "--num_instances_per_obj", "3",
         "--gpu", "2", "--jsonfile", "does_not_exist.json"],
        cwd=str(tmp_path),
    )
    assert "--num_instances_per_obj=3" in r.stderr and "ignored" in r.stderr
    assert "--gpu=2" in r.stderr
    r2 = _run(
        [os.path.join(REPO, "optimize.py"), "--gpu", "1",
         "--jsonfile", "does_not_exist.json"],
        cwd=str(tmp_path),
    )
    assert "--gpu=1" in r2.stderr and "ignored" in r2.stderr


@pytest.fixture(scope="module")
def trained_run(workdir):
    """A tiny trained checkpoint shared by the pose-opt / editing CLI tests
    (kept independent of the train/optimize test's run1)."""
    r = _run(
        [os.path.join(REPO, "train.py"), "--save_dir", "run_tools",
         "--iters_crop", "0", "--iters_all", "40", "--batchsize", "256",
         "--jsonfile", "jsonfiles/tiny.json", "--log_every", "20",
         "--check_iter", "0", "--tensorboard", "false"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return "run_tools"


def test_pose_opt_cli(workdir, trained_run):
    """Driver config #4 from the shell: tools/pose_opt.py recovers a
    perturbed camera pose against a trained checkpoint and writes pose
    errors + strips (the reference only catalogs this capability,
    README.md:24-25)."""
    r = _run(
        [os.path.join(REPO, "tools", "pose_opt.py"),
         "--saved_dir", trained_run, "--jsonfile", "jsonfiles/tiny.json",
         "--splits", "test", "--tgt_instance", "1", "--num_opts", "6",
         "--lr_half_interval", "3", "--rays_per_step", "128",
         "--perturb_rot", "4", "--perturb_trans", "0.05",
         "--save_img", "true"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    pose_dir = workdir / "exps" / trained_run / "pose_opt"
    assert pose_dir.is_dir()
    with open(pose_dir / "results.json") as f:
        results = json.load(f)
    assert len(results["per_object"]) == 2
    for row in results["per_object"]:
        # 6 steps won't converge; the gate is plumbing: errors finite,
        # perturbation magnitudes as requested, PSNR finite.
        assert 0.0 < row["rot_err_deg_before"] < 10.0
        assert np.isfinite(row["rot_err_deg_after"])
        assert np.isfinite(row["psnr_last"])
    assert any(pose_dir.glob("*.png"))


def test_pose_opt_via_optimize_cli(workdir, trained_run):
    """`optimize.py --pose_opt` (the flag SURVEY §8's r4 addendum names)
    dispatches to the pose-opt entry point with the remaining flags."""
    exp = workdir / "exps" / trained_run
    before = {d.name for d in exp.iterdir() if d.name.startswith("pose_opt")}
    r = _run(
        [os.path.join(REPO, "optimize.py"), "--pose_opt",
         "--saved_dir", trained_run, "--jsonfile", "jsonfiles/tiny.json",
         "--splits", "test", "--tgt_instance", "1", "--num_opts", "4",
         "--lr_half_interval", "2", "--rays_per_step", "128",
         "--perturb_rot", "4", "--save_img", "false"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    after = {d.name for d in exp.iterdir() if d.name.startswith("pose_opt")}
    new = after - before
    assert len(new) == 1, (before, after)
    with open(exp / new.pop() / "results.json") as f:
        results = json.load(f)
    assert len(results["per_object"]) == 2
    assert np.isfinite(results["mean_rot_err_deg_after"])


def test_edit_cli(workdir, trained_run):
    """Driver config #5 from the shell: tools/edit.py renders interpolation
    strips + the swap matrix from checkpointed codes."""
    r = _run(
        [os.path.join(REPO, "tools", "edit.py"),
         "--saved_dir", trained_run, "--jsonfile", "jsonfiles/tiny.json",
         "--objects", "0", "1", "--grid", "3", "--view", "0",
         "--batchsize", "256"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    edit_dir = workdir / "exps" / trained_run / "edits"
    for name in ("shape_interp.png", "texture_interp.png",
                 "swap_matrix.png"):
        assert (edit_dir / name).is_file()
    with open(edit_dir / "results.json") as f:
        results = json.load(f)
    assert len(results["diag_psnr"]) == 2
    assert np.isfinite(results["mean_diag_psnr"])
    # out-of-range object indices must fail loudly
    r2 = _run(
        [os.path.join(REPO, "tools", "edit.py"),
         "--saved_dir", trained_run, "--jsonfile", "jsonfiles/tiny.json",
         "--objects", "0", "7"],
        cwd=str(workdir),
    )
    assert r2.returncode != 0
    assert "out of range" in r2.stderr


def test_production_occ_recipe_cli(workdir):
    """The full production recipe from the SHELL alone (VERDICT r3 weak #3):
    train.py with a train_occupancy config, then optimize.py --opt_occ
    --opt_samples --opt_group — the occupancy grid is rebuilt from the
    restored checkpoint (density is a pure function of the trainables, not
    checkpointed), the optimization loop runs the reduced budget inside it,
    and eval scores with the jsonfile's full budget."""
    import json as _json

    with open(workdir / "jsonfiles" / "tiny.json") as f:
        cfg = _json.load(f)
    cfg["bound_sphere_radius"] = 1.4
    cfg["train_occupancy"] = {
        "grid_size": 8, "update_every": 10, "warmup": 10,
        "codes_per_update": 2, "sigma_threshold": 0.01,
        "dilate": 1, "decay": 0.99,
    }
    with open(workdir / "jsonfiles" / "tiny_occ.json", "w") as f:
        _json.dump(cfg, f)

    r = _run(
        [os.path.join(REPO, "train.py"), "--save_dir", "run_occ",
         "--iters_crop", "0", "--iters_all", "30", "--batchsize", "256",
         "--jsonfile", "jsonfiles/tiny_occ.json", "--log_every", "10",
         "--check_iter", "0", "--tensorboard", "false"],
        cwd=str(workdir),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    r2 = _run(
        [os.path.join(REPO, "optimize.py"), "--saved_dir", "run_occ",
         "--tgt_instances", "1", "--splits", "test", "--num_opts", "8",
         "--lr", "1e-2", "--lr_half_interval", "4",
         "--jsonfile", "jsonfiles/tiny_occ.json", "--batchsize", "256",
         "--save_img", "false", "--save_progress", "false",
         "--opt_group", "2", "--opt_occ", "true", "--opt_samples", "6"],
        cwd=str(workdir),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    test_dir = workdir / "exps" / "run_occ" / "test"
    with open(test_dir / "results.json") as f:
        results = _json.load(f)
    assert len(results["per_object"]) == 2
    assert np.isfinite(results["mean_psnr"])

    # --opt_occ without a train_occupancy jsonfile must fail loudly
    r3 = _run(
        [os.path.join(REPO, "optimize.py"), "--saved_dir", "run_occ",
         "--jsonfile", "jsonfiles/tiny.json", "--opt_occ", "true"],
        cwd=str(workdir),
    )
    assert r3.returncode != 0
    assert "train_occupancy" in r3.stderr
