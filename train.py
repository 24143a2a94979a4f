#!/usr/bin/env python
"""Category-level CodeNeRF training CLI.

Flag surface mirrors the reference ``train.py:12-19`` (same names, same
defaults) with TPU-native extensions:

  --data_axis/--model_axis   lay a (data, model) device mesh over all
                             visible chips (jax.sharding; XLA collectives)
  --resume                   continue from the latest checkpoint (the
                             reference cannot resume at all)
  --max_objects              cap the loaded split (memory / smoke runs)
  --tensorboard              enable TB scalars next to the always-on JSONL

``--gpu`` is accepted for CLI compatibility but ignored: device selection
is JAX's (set JAX_PLATFORMS / use the mesh flags).

Step semantics: one step consumes one globally-sampled ray batch
(``--batchsize`` rays, default 16384 = one full 128x128 image's rays), so
``--iters_crop/--iters_all`` are comparable to the reference's
object-iterations (SURVEY §2.3 quirk 8).
"""

import argparse

from codenerf_tpu.config import load_hparams
from codenerf_tpu.utils.images import str2bool


def main() -> None:
    parser = argparse.ArgumentParser(description="Train CodeNeRF (TPU-native)")
    parser.add_argument("--gpu", type=int, default=0,
                        help="ignored (reference compatibility)")
    parser.add_argument("--save_dir", type=str, default="default")
    parser.add_argument("--iters_crop", type=int, default=1_000_000)
    parser.add_argument("--iters_all", type=int, default=1_200_000)
    parser.add_argument("--batchsize", type=int, default=16384)
    parser.add_argument("--jsonfile", type=str, default="srncar.json")
    parser.add_argument("--num_instances_per_obj", type=int, default=2,
                        help="ignored: rays are sampled globally per step")
    parser.add_argument("--exps_root", type=str, default="exps")
    parser.add_argument("--data_axis", type=int, default=-1)
    parser.add_argument("--model_axis", type=int, default=1)
    parser.add_argument("--replica_axis", type=int, default=1,
                        help="multi-slice axis: gradients all-reduce over "
                             "it across slices (DCN); 1 = single slice")
    parser.add_argument("--resume", type=str2bool, default=True)
    parser.add_argument("--tensorboard", type=str2bool, default=False)
    parser.add_argument("--max_objects", type=int, default=None)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--check_iter", type=int, default=10000)
    parser.add_argument("--microbatch", type=int, default=0,
                        help="rays per gradient-accumulation microbatch "
                             "(0 = whole batch at once)")
    args = parser.parse_args()

    import os
    import sys

    # Reference flags accepted for CLI compatibility but with different or
    # no semantics here — warn loudly when a non-default value is passed so
    # nobody silently trains with assumptions that don't hold (VERDICT r1 #4).
    if args.num_instances_per_obj != 2:
        print(
            f"WARNING: --num_instances_per_obj={args.num_instances_per_obj} "
            "is ignored: rays are sampled globally across all objects/views "
            "each step (reference semantics superseded; see train.py docstring)",
            file=sys.stderr,
        )
    if args.gpu != 0:
        print(
            f"WARNING: --gpu={args.gpu} is ignored: device selection is "
            "JAX's (set JAX_PLATFORMS or the --data_axis/--model_axis mesh)",
            file=sys.stderr,
        )

    import jax

    if os.environ.get("CODENERF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CODENERF_PLATFORM"])

    from codenerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from codenerf_tpu.parallel.mesh import make_mesh
    from codenerf_tpu.training.trainer import Trainer

    hp = load_hparams(args.jsonfile)
    mesh = None
    if len(jax.devices()) > 1 or args.model_axis > 1 or args.replica_axis > 1:
        mesh = make_mesh(data=args.data_axis, model=args.model_axis,
                         replica=args.replica_axis)

    trainer = Trainer(
        args.save_dir,
        hp,
        batch_size=args.batchsize,
        exps_root=args.exps_root,
        mesh=mesh,
        use_tensorboard=args.tensorboard,
        check_iter=args.check_iter,
        max_objects=args.max_objects,
        microbatch_rays=args.microbatch,
    )
    if args.resume and trainer.resume():
        print(f"resumed from step {int(trainer.state.step)}")
    metrics = trainer.training(args.iters_crop, args.iters_all,
                               log_every=args.log_every)
    print("final:", metrics)


if __name__ == "__main__":
    main()
