"""Evaluation CLI.

Mirrors the reference entry surface (tools/test.py:96-145):
  python tools/test.py <config> <checkpoint.npz> --backbone <converted.npz>
                       [--max-images N] [--cfg-options ...]
The --backbone flag is the LoadBackboneHook equivalent: the (adapter+head)
checkpoint is merged with the converted frozen backbone at load time
(rein/hooks/load_backbone_hook.py:6-22).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a vfmseg_tpu segmentor")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="trainable-partition checkpoint (.npz)")
    p.add_argument("--backbone", default=None,
                   help="converted backbone weights (.npz)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--tta", action="store_true",
                   help="flip(+multi-scale) test-time augmentation")
    p.add_argument("--show-dir", default=None,
                   help="save colorized prediction PNGs here (reference "
                        "DGIoUMetric output_dir, rein/dg_metrics.py:60-72)")
    p.add_argument("--out", default=None, help="write metrics JSON here")
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard the slide crop batch over an N-device 'data' "
                        "mesh (multi-chip eval; replaces the reference's "
                        "single-GPU TestLoop)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from vfmseg_tpu.core.config import load_config
    from vfmseg_tpu.core.registry import DATASETS
    from vfmseg_tpu.data.transforms import TestPipeline
    from vfmseg_tpu.eval.metrics import CITYSCAPES_CLASSES, IoUAccumulator
    from vfmseg_tpu.models.build import build_segmentor
    from vfmseg_tpu.train.checkpoint import load_pytree
    from vfmseg_tpu.train.optim import merge_params

    cfg = load_config(args.config, args.cfg_options)
    dtype = jnp.bfloat16 if cfg.get_path("compute.dtype", "bfloat16") == "bfloat16" \
        else jnp.float32
    model = build_segmentor(cfg.model, dtype=dtype,
                            attn_impl=cfg.get_path("compute.attn_impl", "auto"))

    # init zeros then overlay checkpoint + backbone
    crop_hw = tuple(cfg.get_path("crop_size", (1024, 1024)))
    img0 = jnp.zeros((1,) + crop_hw + (3,), dtype)
    lab0 = jnp.zeros((1,) + crop_hw, jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "crop": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
             "augment": jax.random.PRNGKey(4)},
            img0, lab0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = variables["params"]
    if args.checkpoint:
        params = merge_params(load_pytree(args.checkpoint)["t"], params)
    if args.backbone:
        from vfmseg_tpu.train.optim import nest_under, resolve_backbone_prefix

        prefix = resolve_backbone_prefix(params)
        params = merge_params(
            nest_under(prefix, load_pytree(args.backbone)), params)
    variables = dict(variables)
    variables["params"] = params

    test_sets = cfg.get_path("data.test") or cfg.get_path("data.val") or []
    keys = [d.get("key", f"set{i}") for i, d in enumerate(test_sets)]
    num_classes = cfg.get("num_classes", 19)
    acc = IoUAccumulator(
        num_classes=num_classes, dataset_keys=keys, mean_used_keys=keys,
        class_names=CITYSCAPES_CLASSES if num_classes == 19 else None)
    # Per-dataset test geometry (reference: each target dataset evaluates
    # through its own pipeline with keep_ratio=True —
    # configs/_base_/datasets/bdd100k_1024x1024.py:15, mapillary/cityscapes
    # same): a dataset entry may carry its own test_resize_wh/keep_ratio,
    # falling back to the combo-level data.test_resize_wh + keep_ratio.
    wh_default = tuple(cfg.get_path("data.test_resize_wh", (2048, 1024)))
    kr_default = bool(cfg.get_path("data.test_keep_ratio", True))

    for dset_cfg, key in zip(test_sets, keys):
        dcfg = {k: v for k, v in dict(dset_cfg).items()
                if k not in ("key", "test_resize_wh", "keep_ratio")}
        wh = tuple(dset_cfg.get("test_resize_wh", wh_default))
        pipeline = TestPipeline(
            resize_scale_wh=wh,
            keep_ratio=bool(dset_cfg.get("keep_ratio", kr_default)))
        dataset = DATASETS.build(dcfg)
        print(f"evaluating {key}: {len(dataset)} images "
              f"(resize_wh={wh}, keep_ratio={pipeline.keep_ratio})")
        mesh = None
        if args.data_parallel:
            from vfmseg_tpu.parallel.mesh import make_mesh

            n = min(args.data_parallel, len(jax.devices()))
            mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])

        n_imgs = min(args.max_images or len(dataset), len(dataset))
        test_cfg = cfg.get("test_cfg", {})
        # eval shape-bucketing (SURVEY §7.3): quantize keep-ratio sizes up
        # to multiples of data.eval_pad_multiple so Mapillary-style
        # heterogeneity compiles a bounded set of inference graphs
        pad_mult = cfg.get_path("data.eval_pad_multiple", None)

        def save_pred(pred, raw, i):
            if not args.show_dir:
                return
            import numpy as _np
            from PIL import Image as _Image

            from vfmseg_tpu.utils.visualization import colorize_label

            os.makedirs(os.path.join(args.show_dir, key), exist_ok=True)
            name = os.path.basename(raw.get("img_path", f"{i}.png"))
            _Image.fromarray(colorize_label(_np.asarray(pred))).save(
                os.path.join(args.show_dir, key, name))

        def out_hw_of(proc):
            # mIoU at the ORIGINAL label resolution, per image (mmseg
            # postprocess semantics); label-free export predicts at the
            # processed (keep-ratio) geometry
            if proc.get("label") is not None:
                return tuple(proc["label"].shape[:2])
            return tuple(proc["img"].shape[:2])

        use_stream = (test_cfg.get("gate") == "compact"
                      and test_cfg.get("mode") == "ms_slide_inference"
                      and not args.tta)
        if use_stream:
            # throughput path: grouped stage-1 + pipelined gate readback;
            # the stream flushes groups on shape changes (heterogeneous
            # sets keep working, homogeneous ones keep full groups)
            from collections import deque

            from vfmseg_tpu.eval.evaluator import stream_evaluate

            meta = deque()

            def image_iter():
                for i in range(n_imgs):
                    raw = dataset[i]
                    proc = pipeline(raw["img"], raw.get("label"))
                    meta.append((raw, proc.get("label"), out_hw_of(proc), i))
                    yield jnp.asarray(proc["img"])

            def out_hw_iter():
                while True:
                    yield meta[0][2]

            preds = stream_evaluate(
                model, variables, test_cfg, image_iter(), None,
                group=test_cfg.get("stream_group", 8), mesh=mesh,
                out_hw_iter=out_hw_iter(), pad_multiple=pad_mult)
            for pred in preds:
                raw, label, _hw, i = meta.popleft()
                acc.update(pred, label, key)
                save_pred(pred, raw, i)
        else:
            from vfmseg_tpu.eval.evaluator import make_shape_aware_predict_fn

            predict = make_shape_aware_predict_fn(
                model, test_cfg, tta=args.tta, mesh=mesh,
                pad_multiple=pad_mult)
            for i in range(n_imgs):
                raw = dataset[i]
                proc = pipeline(raw["img"], raw.get("label"))
                pred = predict(variables, jnp.asarray(proc["img"])[None],
                               out_hw_of(proc))[0]
                acc.update(pred, proc.get("label"), key)
                save_pred(pred, raw, i)

    results = acc.compute()
    # per-dataset per-class IoU tables (reference DGIoUMetric printout)
    for key in list(acc._acc):
        table = acc.per_class_iou(key)
        print(f"--- {key} per-class IoU ---")
        for name, iou in table.items():
            print(f"  {name:>15s}: {iou}")
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
