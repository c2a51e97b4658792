"""Training CLI.

Mirrors the reference entry surface (tools/train.py:64-121):
  python tools/train.py <config> [--work-dir D] [--resume]
                        [--cfg-options k.path=v ...] [--amp]
`--amp` maps to bf16 compute (native on TPU; reference used torch AMP,
tools/train.py:87-102). Distributed launch flags are replaced by the jax
mesh (all devices of the process are used for data parallelism).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a vfmseg_tpu segmentor")
    p.add_argument("config", help="config name or path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (default on TPU; kept for CLI parity)")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="dot-key overrides, e.g. optimizer.lr=3e-4")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--backbone-init", default=None,
                   help="converted backbone weights (.npz from tools/convert_*)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() (the "
                        "jax-native replacement for torch.distributed.launch, "
                        "SURVEY §5.8)")
    p.add_argument("--list-params", action="store_true",
                   help="print every trainable parameter path and shape "
                        "(reference rein/utils/print_trainable_param.py)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.distributed:
        jax.distributed.initialize()
    import jax.numpy as jnp
    import numpy as np

    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.core.registry import DATASETS
    from vfmseg_tpu.data.loader import InfiniteLoader
    from vfmseg_tpu.data.transforms import TrainPipeline
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.train import (
        TrainState, make_optimizer, make_train_step, partition_params,
        trainable_predicate,
    )
    from vfmseg_tpu.train.checkpoint import load_pytree
    from vfmseg_tpu.train.loop import train_loop
    from vfmseg_tpu.train.optim import merge_params

    cfg = load_config(args.config, args.cfg_options)
    work_dir = args.work_dir or os.path.join("work_dirs", cfg.get("name", "run"))
    os.makedirs(work_dir, exist_ok=True)

    dtype = jnp.bfloat16 if (
        args.amp or cfg.get_path("compute.dtype", "bfloat16") == "bfloat16"
    ) else jnp.float32
    model = build_segmentor(cfg.model, dtype=dtype,
                            attn_impl=cfg.get_path("compute.attn_impl", "auto"))

    # ---- data -------------------------------------------------------
    dcfg = cfg.data
    uda_cfg = cfg.get("uda")
    source = DATASETS.build(dict(dcfg.source))
    pipeline = TrainPipeline(**{k: tuple(v) if isinstance(v, list) else v
                                for k, v in dict(dcfg.train_pipeline).items()})
    if uda_cfg:
        target = DATASETS.build(dict(dcfg.target))
        dataset = DATASETS.get("UDADataset")(
            source, target, pipeline,
            rare_class_sampling=dcfg.get("rare_class_sampling"),
            seed=cfg.get_path("schedule.seed", 0))
    else:
        dataset = DATASETS.get("DGDataset")(
            source, pipeline,
            rare_class_sampling=dcfg.get("rare_class_sampling"),
            seed=cfg.get_path("schedule.seed", 0))
    loader = InfiniteLoader(dataset, batch_size=dcfg.get("batch_size", 2),
                            num_workers=dcfg.get("num_workers", 4),
                            seed=cfg.get_path("schedule.seed", 0))

    # ---- init -------------------------------------------------------
    seed = cfg.get_path("schedule.seed", 0)
    rng = jax.random.PRNGKey(seed)
    crop_hw = tuple(cfg.get_path("data.train_pipeline.crop_size", (1024, 1024)))
    img0 = jnp.zeros((dcfg.get("batch_size", 2),) + crop_hw + (3,), dtype)
    lab0 = jnp.zeros((dcfg.get("batch_size", 2),) + crop_hw, jnp.int32)
    variables = model.init(
        {"params": rng, "crop": rng, "mask": rng, "dropout": rng,
         "augment": rng}, img0, lab0)
    params = variables["params"]

    if args.backbone_init:
        from vfmseg_tpu.train.optim import nest_under, resolve_backbone_prefix

        loaded = load_pytree(args.backbone_init)
        prefix = resolve_backbone_prefix(params)
        params = merge_params(nest_under(prefix, loaded), params)
        print(f"loaded backbone weights from {args.backbone_init} "
              f"-> {'/'.join(prefix)}")

    from vfmseg_tpu.train.optim import ADAPTER_KEYWORDS

    peft = cfg.get("peft", {})
    pred = trainable_predicate(
        peft=peft.get("enabled", True),
        adapter_keywords=tuple(peft.get("adapter_keywords",
                                        ADAPTER_KEYWORDS)))
    trainable, frozen = partition_params(params, pred)

    ocfg = cfg.get("optimizer", {})
    max_iters = args.max_iters or cfg.get_path("schedule.max_iters", 40000)
    optimizer = make_optimizer(
        trainable,
        base_lr=ocfg.get("lr", 1e-4), weight_decay=ocfg.get("weight_decay", 0.05),
        max_steps=max_iters, power=ocfg.get("poly_power", 0.9),
        warmup_steps=ocfg.get("warmup_steps", 0),
        betas=tuple(ocfg.get("betas", (0.9, 0.999))), eps=ocfg.get("eps", 1e-8))

    n_train = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
    n_total = n_train + sum(x.size for x in jax.tree_util.tree_leaves(frozen))
    print(f"trainable params: {n_train:,} / {n_total:,} "
          f"({100.0 * n_train / n_total:.2f}%)")
    if args.list_params:
        from flax.traverse_util import flatten_dict

        for key, leaf in sorted(flatten_dict(trainable).items()):
            print(f"  [train] {'/'.join(key)}: {tuple(leaf.shape)}")

    ema = None
    if uda_cfg:
        from vfmseg_tpu.train.optim import merge_params as _merge
        from vfmseg_tpu.train.uda import DACSConfig, make_dacs_train_step

        head_key = uda_cfg.get("head_key", "decode_head")
        # materialize a copy: aliasing the student buffers would break
        # donation (same buffer donated twice)
        ema = jax.tree_util.tree_map(
            jnp.array, _merge(trainable, frozen)[head_key])

    state = TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(trainable), ema=ema)

    # ---- multi-chip data parallelism (the NCCL-DDP replacement) --------
    # All local devices form a data mesh; the batch shards over it and
    # gradients all-reduce automatically under jit. Disable or narrow with
    # --cfg-options compute.data_parallel=N.
    batch_sharding = None
    n_dp = cfg.get_path("compute.data_parallel", len(jax.devices()))
    if n_dp > 1:
        from vfmseg_tpu.parallel.mesh import (
            batch_sharding as make_batch_sharding, make_mesh, replicate)

        bs = dcfg.get("batch_size", 2)
        if bs % n_dp:
            n_dp = max(d for d in range(1, n_dp + 1) if bs % d == 0)
            print(f"batch_size {bs} not divisible by device count; "
                  f"using data_parallel={n_dp}")
        if n_dp > 1:
            mesh = make_mesh(data=n_dp, model=1,
                             devices=jax.devices()[:n_dp])
            state = jax.device_put(state, replicate(mesh))
            batch_sharding = make_batch_sharding(mesh)
            print(f"data-parallel training over {n_dp} devices")

    if uda_cfg:
        dacs = DACSConfig(
            pseudo_threshold=uda_cfg.get("pseudo_threshold", 0.968),
            psweight_ignore_top=uda_cfg.get("pseudo_weight_ignore_top", 15),
            psweight_ignore_bottom=uda_cfg.get(
                "pseudo_weight_ignore_bottom", 120),
            color_jitter_strength=uda_cfg.get("color_jitter_strength", 0.25),
            color_jitter_probability=uda_cfg.get(
                "color_jitter_probability", 0.2),
            blur=uda_cfg.get("blur", True),
            num_classes=cfg.get("num_classes", 19),
            alpha=uda_cfg.get("alpha", 0.999),
            head_key=uda_cfg.get("head_key", "decode_head"))
        step_fn = make_dacs_train_step(model, optimizer, dacs)
    else:
        step_fn = make_train_step(model, optimizer)
    sched = cfg.get("schedule", {})

    # ---- periodic validation (reference val_interval, SURVEY §4.2) ----
    val_fn = None
    val_sets = cfg.get_path("data.val") or []
    if val_sets and sched.get("val_interval", 0):
        from vfmseg_tpu.core.registry import DATASETS as _DS
        from vfmseg_tpu.data.transforms import TestPipeline
        from vfmseg_tpu.eval.evaluator import make_predict_fn
        from vfmseg_tpu.eval.metrics import IoUAccumulator
        from vfmseg_tpu.train.optim import merge_params as _mp

        val_keys = [d.get("key", f"val{i}") for i, d in enumerate(val_sets)]
        val_datasets = [
            _DS.build({k: v for k, v in dict(d).items() if k != "key"})
            for d in val_sets
        ]
        wh = tuple(cfg.get_path("data.test_resize_wh", (2048, 1024)))
        val_pipe = TestPipeline(resize_scale_wh=wh)
        max_val = cfg.get_path("data.val_max_images", 50)
        # build each dataset's jitted predict fn ONCE and reuse across val
        # rounds — a fresh jit closure per round recompiles the full model
        val_predicts = {}

        def val_fn(state):
            variables = {"params": _mp(state.trainable, state.frozen)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            acc = IoUAccumulator(num_classes=cfg.get("num_classes", 19),
                                 dataset_keys=val_keys,
                                 mean_used_keys=val_keys)
            for key, ds in zip(val_keys, val_datasets):
                if key not in val_predicts:
                    sample = ds[0]
                    out_hw = (sample["label"].shape if "label" in sample
                              else (wh[1], wh[0]))
                    val_predicts[key] = make_predict_fn(
                        model, cfg.get("test_cfg", {}), out_hw=out_hw)
                predict = val_predicts[key]
                for i in range(min(max_val, len(ds))):
                    raw = ds[i]
                    proc = val_pipe(raw["img"], raw.get("label"))
                    pred = predict(variables, jnp.asarray(proc["img"])[None])[0]
                    acc.update(pred, proc["label"], key)
            return acc.compute()

    # ---- periodic debug image dumps (reference class_mix_debug grids) --
    debug_interval = cfg.get_path("log_config.img_interval", 0) or sched.get(
        "debug_interval", 0)
    debug_fn = None
    if debug_interval:
        from vfmseg_tpu.eval.evaluator import unwrap_model
        from vfmseg_tpu.models.segmentors.ms_vfm import MsVFMSegmentor
        from vfmseg_tpu.train.optim import merge_params as _mp2
        from vfmseg_tpu.utils.visualization import (
            denormalize_image, save_debug_grid)

        if uda_cfg:
            from vfmseg_tpu.train.uda import make_dacs_debug_fn

            dacs_debug = make_dacs_debug_fn(model, dacs)
        else:
            dacs_debug = None

        def _entropy(logits):
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return -jnp.sum(p * jnp.log(p + 1e-12), axis=-1) / jnp.log(
                jnp.float32(p.shape[-1]))

        def debug_fn(state, batch, step):
            """Reference-style class_mix_debug grids: image/gt/pred plus the
            MsVFM lr/hr/refined/entropy panels
            (Ms_VFM_encoder_decoder.py:202-265) and, under DACS, the
            pseudo-label / mix-mask / mixed-sample / teacher-entropy panels
            (dacs.py:310-362)."""
            variables = {"params": _mp2(state.trainable, state.frozen)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            inner, rescope = unwrap_model(model)
            ivars = rescope(variables) if rescope is not None else variables
            img = jnp.asarray(batch["img"][:1])
            panels = {
                "image": denormalize_image(np.asarray(batch["img"][0])),
                "gt": np.asarray(batch["label"][0]),
            }
            if isinstance(inner, MsVFMSegmentor):
                lr_logits = inner.apply(ivars, img,
                                        method=MsVFMSegmentor.lr_forward)
                panels["lr_pred"] = np.asarray(jnp.argmax(lr_logits, -1))[0]
                panels["lr_entropy"] = np.asarray(_entropy(lr_logits))[0]
                # refined center crop conditioned on the (detached) lr logits
                ch, cw = inner.hr_crop_size
                y0 = (img.shape[1] - ch) // 2
                x0 = (img.shape[2] - cw) // 2
                crop = img[:, y0:y0 + ch, x0:x0 + cw]
                ctx = lr_logits[:, y0:y0 + ch, x0:x0 + cw]
                hr_logits = inner.apply(ivars, crop, ctx, False, False,
                                        method=MsVFMSegmentor.hr_forward)
                panels["hr_refined"] = np.asarray(jnp.argmax(hr_logits, -1))[0]
            elif hasattr(type(inner), "encode_decode"):
                logits = inner.apply(ivars, img,
                                     method=type(inner).encode_decode)
                panels["pred"] = np.asarray(jnp.argmax(logits, -1))[0]
                panels["entropy"] = np.asarray(_entropy(logits))[0]
            if dacs_debug is not None and "target_img" in batch:
                d = dacs_debug(state, batch, rng)
                panels["target"] = denormalize_image(
                    np.asarray(batch["target_img"][0]))
                panels["pseudo_label"] = np.asarray(d["pseudo_label"])[0]
                panels["mix_mask"] = np.asarray(d["mix_mask"])[0]
                panels["mixed_image"] = denormalize_image(
                    np.asarray(d["mixed_img"][0]))
                panels["mixed_label"] = np.asarray(d["mixed_lbl"])[0]
                panels["teacher_entropy"] = np.asarray(d["entropy"])[0]
            save_debug_grid(os.path.join(work_dir, "class_mix_debug"),
                            step, panels, cols=4)

    train_loop(
        state, step_fn, iter(loader), max_iters=max_iters, work_dir=work_dir,
        rng=rng, log_interval=sched.get("log_interval", 50),
        checkpoint_interval=sched.get("checkpoint_interval", 4000),
        max_keep_ckpts=sched.get("max_keep_ckpts", 3),
        val_interval=sched.get("val_interval", 0), val_fn=val_fn,
        debug_interval=debug_interval, debug_fn=debug_fn,
        save_best=sched.get("save_best"),
        resume=args.resume,
        batch_sharding=batch_sharding)
    loader.close()


if __name__ == "__main__":
    main()
