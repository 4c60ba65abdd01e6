"""Training CLI.

Flag-for-flag compatible with reference train.py:141-164 (same names,
defaults, and phase selection: ``--train_denoise`` > ``--resnet`` > default
SRGAN), plus TPU-native additions (``--train_json``, ``--vgg_weights``,
``--eval_every``). ``--dml``/``--tpu`` are accepted for CLI compatibility and
ignored: device selection is automatic (the TPU-native build always runs on
the default JAX backend, data-parallel over all local devices).

Phase wiring mirrors reference train.py:204-388; checkpoints keep the
reference's naming scheme and per-epoch overwrite.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train SR / SRGAN / denoise models")
    # --- reference-compatible flags (train.py:141-164) ---
    parser.add_argument("--resnet", action="store_true", help="pixel-loss pretrain phase")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--train_denoise", action="store_true")
    parser.add_argument("--worker", type=int, default=2)
    parser.add_argument(
        "--loader_backend", type=str, default="auto",
        choices=["auto", "native", "python"],
        help="host patch loader: native C++ (ROI decode) or cv2/PIL threads",
    )
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--work_dir", type=str, default="./")
    parser.add_argument(
        "--momentum", type=float, default=0.999,
        help="adam beta2 (documented deviation: the reference parses this "
             "flag but never uses it — its Adam betas are hardcoded "
             "(0.9, 0.999), reference train.py:148,265. Here it is live; the "
             "default reproduces the reference exactly. See docs/MIGRATION.md)",
    )
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--dml", action="store_true", help="ignored (device is automatic)")
    parser.add_argument("--mean", action="store_true", help="compute dataset mean/std")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--L1_loss", action="store_true")
    parser.add_argument("--rs_deep", type=int, default=None,
                        help="trunk depth (default: 16 for the reference "
                             "families, 14 for --family fast)")
    parser.add_argument("--shape", type=int, default=96)
    parser.add_argument("--save_name", type=str, default="checkpoint")
    parser.add_argument("--lr2", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=100)
    parser.add_argument("--add_rate", type=float, default=0.2)
    parser.add_argument("--enchant", action="store_true")
    parser.add_argument("--tpu", action="store_true", help="ignored (device is automatic)")
    # --- TPU-native additions ---
    parser.add_argument("--family", type=str, default="sr",
                        choices=["sr", "fast"],
                        help="model family: sr = reference topology "
                             "(ResNet/EResNet, or Denoise with "
                             "--train_denoise); fast = TPU-first flagship "
                             "(models/fast.py, MXU-aligned width-128 trunk; "
                             "with --train_denoise: the denoise_fast "
                             "variant at 1/downshuffle resolution)")
    parser.add_argument("--downshuffle", type=int, default=None,
                        help="fast-denoiser sub-pixel front factor (default "
                             "2): the trunk runs at 1/f resolution on 3*f^2 "
                             "channels — only with --train_denoise "
                             "--family fast")
    parser.add_argument("--width", type=int, default=None,
                        help="generator trunk width (default: 64 for sr, "
                             "128 for fast)")
    parser.add_argument("--refine_blocks", type=int, default=0,
                        help="fast family only: full-resolution refinement "
                             "tail — k narrow residual blocks AFTER the "
                             "sub-pixel shuffle (models/fast.py; the "
                             "quality lever for the downshuffled denoiser, "
                             "PERF.md). 0 = the born-folded tail")
    parser.add_argument("--refine_width", type=int, default=32,
                        help="channel width of the refinement blocks")
    parser.add_argument("--preset", type=str, default=None,
                        choices=["denoise_fullres"],
                        help="named configuration shortcut. denoise_fullres "
                             "= the measured x1 FIDELITY preset (PERF.md "
                             "round-5 gate: +1.9 dB PSNR-Y over the "
                             "reference denoiser topology at equal budget): "
                             "--train_denoise --family fast --downshuffle 1 "
                             "--rs_deep 6 — the width-128 trunk at FULL "
                             "resolution, FLOP parity with the reference "
                             "topology. Explicit flags override the preset")
    parser.add_argument("--train_json", type=str, default="./train_images.json")
    parser.add_argument("--vgg_weights", type=str, default=None,
                        help="VGG19 ImageNet weights for the perceptual loss: "
                             "an npz, or a raw torchvision .pth/.pt state_dict "
                             "(auto-converted to a cached npz beside it)")
    parser.add_argument("--eval_json", type=str, default=None)
    parser.add_argument("--eval_every", type=int, default=0, help="epochs between evals")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize RRDB activations (bigger batches)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace of steps 2-4 here")
    parser.add_argument("--ckpt_every", type=int, default=1,
                        help="epochs between checkpoint saves (reference "
                             "saves every epoch; raise this when epochs are "
                             "short — each GAN save fetches the full D state)")
    parser.add_argument("--ckpt_backend", type=str, default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="checkpoint format: single msgpack file "
                             "(default) or an Orbax directory with the same "
                             "payload/lifecycle (train/orbax_io.py)")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation cache directory "
                             "(default ~/.cache/image_super_resolution_tpu/"
                             "xla_cache, or $ISR_COMPILE_CACHE; 'off' "
                             "disables) — restarts/resumes skip the "
                             "train-step compile")
    return parser


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)
    run_training(opt)


def run_training(opt) -> None:
    random.seed(opt.seed)
    np.random.seed(opt.seed)

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(opt, "compile_cache", None))

    import jax
    import jax.numpy as jnp

    from ..core.mesh import batch_sharding, make_mesh, replicated_sharding
    from ..data.pipeline import DevicePrefetcher, LoaderConfig, PatchLoader
    from ..models import Denoiser, Discriminator, SRGenerator
    from ..train import (
        build_optimizer,
        checkpoint_name,
        checkpoint_exists,
        create_train_state,
        load_any_checkpoint,
        make_denoise_train_step,
        make_eval_step,
        make_gan_train_step,
        make_pixel_train_step,
        resume_state,
        save_checkpoint,
        warm_start_generator,
    )
    from ..utils.logging import MetricsLogger

    from ..models.deploy import family_defaults

    if opt.preset == "denoise_fullres":
        # The x1 fidelity preset (PERF.md round-5 W gate). Explicit flags
        # win: only fill the fields the user left at their defaults.
        opt.train_denoise = True
        opt.family = "fast"
        if opt.downshuffle is None:
            opt.downshuffle = 1
        if opt.rs_deep is None:
            opt.rs_deep = 6
    opt.rs_deep, opt.width = family_defaults(opt.family, opt.rs_deep, opt.width)
    if opt.family == "fast" and opt.enchant:
        raise SystemExit(
            "--enchant is a reference-topology variant (EResNet); the fast "
            "family is BN-free by construction — drop one of the flags"
        )
    if opt.downshuffle is not None and not (
        opt.train_denoise and opt.family == "fast"
    ):
        raise SystemExit(
            "--downshuffle applies to the fast DENOISER only "
            "(--train_denoise --family fast); the SR flagship always runs "
            "its trunk at LR resolution"
        )
    if opt.downshuffle is not None and opt.downshuffle < 1:
        raise SystemExit(f"--downshuffle must be >= 1, got {opt.downshuffle}")
    if opt.refine_blocks and opt.family != "fast":
        raise SystemExit(
            "--refine_blocks applies to the fast family only "
            "(--family fast; models/fast.py refinement tail)"
        )
    if opt.refine_blocks < 0:
        raise SystemExit(
            f"--refine_blocks must be >= 0, got {opt.refine_blocks}")

    work_dir = Path(opt.work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    phase = "denoise" if opt.train_denoise else ("pixel" if opt.resnet else "gan")
    ckpt_path = work_dir / checkpoint_name(phase, opt.save_name, opt.rs_deep, opt.add_rate)
    res_ckpt_path = work_dir / checkpoint_name("pixel", opt.save_name, opt.rs_deep, opt.add_rate)
    # --ckpt_backend picks the SAVE format (msgpack file vs Orbax directory,
    # same payload/lifecycle). Loads always dispatch on what is actually on
    # disk (load_any_checkpoint): a resume or GAN warm start must work when
    # the earlier phase was written by the OTHER backend — pinning the loader
    # to the save backend silently skipped the warm start in that case.
    load_ckpt = load_any_checkpoint
    if opt.ckpt_backend == "orbax":
        from ..train.orbax_io import save_checkpoint_orbax as save_ckpt
    else:
        save_ckpt = save_checkpoint
    logger = MetricsLogger(work_dir, opt.save_name,
                           use_tensorboard=not opt.no_tensorboard,
                           enabled=jax.process_index() == 0)

    scale = 1 if phase == "denoise" else opt.scale
    cfg = LoaderConfig(
        batch_size=opt.batch_size, patch_size=opt.shape, scale=scale,
        workers=opt.worker, seed=opt.seed, backend=opt.loader_backend,
    )
    loader = PatchLoader(
        opt.train_json, cfg,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    if opt.mean:
        loader.calculate_stats()
    mean, std = list(loader.mean), list(loader.std)
    steps_per_epoch = len(loader)
    total_steps = opt.epochs * steps_per_epoch
    print(f"Train: {len(loader.samples)} images, {steps_per_epoch} steps/epoch, "
          f"phase={phase}, devices={jax.device_count()}")

    # DP sharding needs batch_size % n_devices == 0. Rather than silently
    # failing (or changing the user's batch size, which changes training
    # dynamics), shrink the data mesh to the largest compatible device count.
    n_dev = jax.device_count()
    if jax.process_count() > 1:
        # Multi-host: --batch_size is PER HOST (each host loads its manifest
        # stripe); global batch = batch_size * process_count. The mesh spans
        # every host's devices, so it cannot be shrunk — require a clean fit.
        local_dev = jax.local_device_count()
        if opt.batch_size % local_dev:
            raise SystemExit(
                f"multi-host: per-host --batch_size {opt.batch_size} must be "
                f"divisible by the local device count {local_dev}"
            )
        print(f"Train: multi-host {jax.process_count()} processes, "
              f"global batch {opt.batch_size * jax.process_count()}")
        n_data = n_dev
    else:
        from ..core.mesh import largest_divisible_device_count

        n_data = largest_divisible_device_count(opt.batch_size, n_dev)
        if n_data != n_dev:
            print(f"Train: batch_size={opt.batch_size} not divisible by {n_dev} "
                  f"devices; using a {n_data}-device data mesh")
    mesh = make_mesh(n_data=n_data, n_tile=1)
    data_shard = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def make_tx():
        return build_optimizer(
            lr=opt.lr, lr2=opt.lr2, total_steps=total_steps,
            weight_decay=opt.weight_decay, b2=opt.momentum,
        )

    rng = jax.random.PRNGKey(opt.seed)

    def n_params(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree))

    def build_generator():
        if opt.family == "fast":
            from ..models import FastSRGenerator

            return FastSRGenerator(depth=opt.rs_deep, add_rate=opt.add_rate,
                                   scale=opt.scale, width=opt.width,
                                   refine_blocks=opt.refine_blocks,
                                   refine_width=opt.refine_width,
                                   remat=opt.remat)
        return SRGenerator(depth=opt.rs_deep, add_rate=opt.add_rate,
                           scale=opt.scale, enchant=opt.enchant,
                           width=opt.width, remat=opt.remat)

    if phase == "denoise":
        if opt.family == "fast":
            # TPU-first denoiser: the fast trunk at 1/downshuffle resolution
            # (models/fast.py FastDenoiser; family "denoise_fast" at export).
            from ..models import FastDenoiser

            model = FastDenoiser(depth=opt.rs_deep, add_rate=opt.add_rate,
                                 width=opt.width,
                                 downshuffle=opt.downshuffle or 2,
                                 refine_blocks=opt.refine_blocks,
                                 refine_width=opt.refine_width,
                                 remat=opt.remat)
        else:
            model = Denoiser(depth=opt.rs_deep)
        state = create_train_state(model, (1, opt.shape, opt.shape, 3), make_tx(), rng)
        step_fn = make_denoise_train_step(mean, std)
    elif phase == "pixel":
        model = build_generator()
        state = create_train_state(model, (1, 24, 24, 3), make_tx(), rng,
                                   ema_tau=total_steps)
        pixel_loss = "l1" if (opt.enchant or opt.L1_loss) else "mse"
        step_fn = make_pixel_train_step(opt.scale, "tanh", pixel_loss, mean, std)
    else:  # gan
        from ..losses.perceptual import PerceptualLoss
        from ..models.vgg import TruncatedVGG19, init_vgg_params

        model = build_generator()
        state = create_train_state(model, (1, 24, 24, 3), make_tx(), rng,
                                   ema_tau=total_steps)
        d_model = Discriminator(3, 64, 8, 1024)
        d_state = create_train_state(
            d_model, (1, loader.patch, loader.patch, 3), make_tx(),
            jax.random.PRNGKey(opt.seed + 1), with_ema=False,
        )
        vgg = TruncatedVGG19(i=5, j=4, before_act=opt.enchant)
        vgg_params, vgg_loaded = init_vgg_params(vgg, opt.vgg_weights,
                                                 with_status=True)
        if jax.process_count() > 1:
            # Hosts without a shared filesystem could silently fall back to
            # random VGG features (init_vgg_params warns but proceeds) while
            # host 0 uses real weights — per-host DIFFERENT loss programs
            # whose gradients get psum-averaged. Broadcast proc 0's weights
            # and its loaded/fallback decision.
            from jax.experimental import multihost_utils

            vgg_params = multihost_utils.broadcast_one_to_all(vgg_params)
            vgg_loaded = bool(
                multihost_utils.broadcast_one_to_all(
                    jnp.asarray(int(vgg_loaded))
                )
            )
        # Random-weight fallback: RMS-normalize features so loss/content has a
        # reference-comparable magnitude (calibration measured in PERF.md).
        perceptual = PerceptualLoss(vgg_params, before_act=opt.enchant,
                                    feature_norm=not vgg_loaded)
        step_fn = make_gan_train_step(opt.scale, perceptual, mean, std)

    start_epoch = 0
    if phase == "gan":
        if opt.resume and checkpoint_exists(ckpt_path):  # file, dir, or crash .old
            print(f"Train: load state dict from {ckpt_path}")
            ckpt = load_ckpt(ckpt_path)
            # "always": the reference GAN resume continues the epoch counter
            # with no match/optimizer guard (train.py:337-346)
            state, start_epoch = resume_state(state, ckpt,
                                              epoch_policy="always")
            if "d_params" in ckpt:
                from ..utils.general import intersect_trees

                d_params, _, _ = intersect_trees(ckpt["d_params"], d_state.params)
                d_stats, _, _ = intersect_trees(ckpt.get("d_batch_stats", {}),
                                                d_state.batch_stats)
                to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
                d_state = d_state.replace(params=to_dev(d_params),
                                          batch_stats=to_dev(d_stats))
                if "d_opt_state" in ckpt:
                    from flax import serialization as _ser

                    try:
                        d_opt = _ser.from_state_dict(
                            d_state.opt_state, ckpt["d_opt_state"]
                        )
                    except (ValueError, KeyError) as e:
                        # same tolerance as resume_state: a pre-format-change
                        # optimizer chain resumes weights-only with a warning
                        print(
                            "WARNING: discriminator optimizer state in "
                            f"checkpoint is incompatible ({e}); resuming D "
                            "weights only"
                        )
                    else:
                        d_state = d_state.replace(
                            opt_state=d_opt,
                            step=jnp.asarray(ckpt.get("d_step", 0), jnp.int32),
                        )
        else:
            state = warm_start_generator(state, res_ckpt_path, load_fn=load_ckpt)
    elif opt.resume and checkpoint_exists(ckpt_path):
        print(f"load from {ckpt_path}")
        # Per-phase reference parity: pixel continues the epoch counter past
        # an optimizer-dropped final checkpoint when all params matched
        # (reference train.py:282-285), denoise only when the optimizer was
        # restored (train.py:217-219) — i.e. a finished denoise run resumed
        # with a larger --epochs warm-restarts its schedule from epoch 0.
        state, start_epoch = resume_state(
            state, load_ckpt(ckpt_path),
            epoch_policy="matched" if phase == "pixel" else "opt",
        )

    # Reference dumps the first 10 batches of hr/lr images to TensorBoard as a
    # visual pipeline check when not resuming (train.py:250-256).
    if not opt.resume and phase != "denoise" and jax.process_index() == 0:
        # (proc 0 only: the dump is host-local decode + TB writes, no
        # collectives — other hosts would decode 10 batches into a disabled
        # logger.)
        from ..data.degrade import downscale

        for idx, batch in enumerate(loader):
            logger.images("images/hr", batch, idx)
            lr_u8 = np.asarray(
                jnp.clip(downscale(jnp.asarray(batch, jnp.float32) / 255.0, scale)
                         * 255.0, 0, 255)
            ).astype(np.uint8)
            logger.images("images/lr", lr_u8, idx)
            if idx == 9:  # 10 batches, matching reference train.py:250-256
                break

    if jax.process_count() > 1:
        # Hosts need not share a filesystem: --resume / the GAN warm start
        # could load different (or no) weights on different processes, and a
        # differing start_epoch desyncs the lockstep epoch loop (deadlock).
        # Broadcast process 0's full state so every host trains identically.
        from jax.experimental import multihost_utils

        state = multihost_utils.broadcast_one_to_all(state)
        if phase == "gan":
            d_state = multihost_utils.broadcast_one_to_all(d_state)
        start_epoch = int(
            multihost_utils.broadcast_one_to_all(jnp.asarray(start_epoch))
        )

    print(f"Train: {opt.epochs} epochs, {n_params(state.params):,} parameters")
    eval_fn = make_eval_step(scale, mean, std) if opt.eval_every else None
    eval_loader = None
    if opt.eval_every and opt.eval_json:
        eval_loader = PatchLoader(opt.eval_json, cfg)

    state = jax.device_put(state, repl)
    if phase == "gan":
        d_state = jax.device_put(d_state, repl)

    from ..utils.profiling import trace

    denoise_rng = jax.random.PRNGKey(opt.seed + 2)
    profiler_ctx = None
    global_step = 0
    loss_key = "loss/content" if phase == "gan" else "loss"
    for epoch in range(start_epoch, opt.epochs):
        loader.set_epoch(epoch)
        # No per-step host syncs: steps are dispatched asynchronously and the
        # device metrics (tiny scalars) are fetched ONCE at epoch end — each
        # blocking float() costs a full host<->device round trip otherwise.
        start_step = int(state.step)
        pending = []
        t0 = None
        # The with-block reclaims the producer thread even when a step raises
        # (an abandoned put-blocked producer would otherwise leak).
        with DevicePrefetcher(iter(loader), sharding=data_shard) as prefetcher:
            for batch in prefetcher:
                # Profile steps 2-4 (past compilation) when requested.
                if opt.profile_dir and global_step == 2 and profiler_ctx is None:
                    profiler_ctx = trace(opt.profile_dir)
                    profiler_ctx.__enter__()
                if phase == "gan":
                    state, d_state, metrics = step_fn(state, d_state, batch)
                elif phase == "denoise":
                    denoise_rng, sub = jax.random.split(denoise_rng)
                    state, metrics = step_fn(state, batch, sub)
                else:
                    state, metrics = step_fn(state, batch)
                pending.append(metrics)
                global_step += 1
                if t0 is None:  # time from first step dispatch (skips compile)
                    jax.block_until_ready(metrics)
                    import time as _time

                    t0 = _time.perf_counter()
                if profiler_ctx is not None and global_step == 5:
                    jax.block_until_ready(metrics)
                    profiler_ctx.__exit__(None, None, None)
                    profiler_ctx = None
                    print(f"profiler trace written to {opt.profile_dir}")
        if not pending:
            raise RuntimeError(
                "epoch produced zero training batches — the input pipeline is "
                "broken (empty manifest or producer failure)"
            )
        # One fetch for the whole epoch; blocks until every step finished,
        # which also makes the wall-clock throughput below honest.
        fetched = jax.device_get(pending)
        import time as _time

        elapsed = max(_time.perf_counter() - t0, 1e-9)
        patches_per_sec = (
            (len(pending) - 1) * opt.batch_size / elapsed if len(pending) > 1
            else opt.batch_size / elapsed
        )
        losses = [float(m[loss_key]) for m in fetched]
        for i, m in enumerate(fetched):
            logger.scalars(m, start_step + i + 1)
        logger.scalar("throughput/patches_per_sec", patches_per_sec,
                      int(state.step))
        print(f"Epoch [{epoch}] mean loss {np.mean(losses):.5f} "
              f"({patches_per_sec:.1f} patches/s)")
        if not np.all(np.isfinite(losses)):
            print("WARNING: non-finite loss encountered this epoch — "
                  "check lr / data; checkpoint still saved")

        final = epoch == opt.epochs - 1
        if final or (epoch + 1) % max(opt.ckpt_every, 1) == 0:
            extra = None
            if phase == "gan":
                from flax import serialization as _ser

                extra = {
                    "d_params": jax.device_get(d_state.params),
                    "d_batch_stats": jax.device_get(d_state.batch_stats),
                }
                if not final:
                    # Reference saved/restored optimizer_d too
                    # (train.py:339,379); without it a resumed D restarts its
                    # Adam moments + schedule.
                    extra["d_opt_state"] = jax.device_get(
                        _ser.to_state_dict(d_state.opt_state)
                    )
                    extra["d_step"] = int(jax.device_get(d_state.step))
            if jax.process_index() == 0:  # one writer in multi-host runs
                save_ckpt(
                    ckpt_path, state, epoch, mean, std, losses,
                    final=final, extra=extra,
                )

        if eval_fn is not None and eval_loader is not None and (
            (epoch + 1) % opt.eval_every == 0
        ):
            # Multi-host: the eval loader is UNSTRIPED (same manifest + seed on
            # every host -> identical batch sequence), and each local batch
            # must become a global array before the jitted eval runs over the
            # globally-sharded state. Every process takes this branch in
            # lockstep, so the SPMD programs stay aligned.
            def to_global(b):
                if jax.process_count() > 1:
                    return jax.make_array_from_process_local_data(
                        data_shard, np.asarray(b)
                    )
                return b

            ms = [eval_fn(state, to_global(b))
                  for _, b in zip(range(8), iter(eval_loader))]
            agg = {k: float(np.mean([float(m[k]) for m in ms])) for k in ms[0]}
            logger.scalars({f"eval/{k}": v for k, v in agg.items()}, int(state.step))
            print(f"Eval [{epoch}] " + " ".join(f"{k}={v:.3f}" for k, v in agg.items()))

    if profiler_ctx is not None:  # loop ended before step 5
        profiler_ctx.__exit__(None, None, None)
    logger.close()


if __name__ == "__main__":
    main()
