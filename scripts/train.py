"""Fine-tuning CLI for the inklayer-tpu model zoo.

The reference fine-tuned its GroundingDINO offline (README: miatang13/
InkLayer checkpoint) and ships a metric-depth trainer
(Depth_Anything_V2/metric_depth/train.py: SiLog loss, dist launcher); this
is the TPU-native equivalent: pjit train step over a (dp, fsdp, tp) mesh,
orbax checkpointing, three task recipes.

    python scripts/train.py --task sam --data DIR --steps 100 \
        --dp 4 --fsdp 2 --ckpt /tmp/ckpt
    python scripts/train.py --task depth --synthetic 8 --steps 3 --cpu

Data layout (per sample): `<name>.png` image plus
  sam:   `<name>_mask.png` binary target + `<name>_boxes.json` [[x1,y1,x2,y2]]
  depth: `<name>_depth.npy` float target (HxW)
  gdino: `<name>_boxes.json` normalized cxcywh + token span targets
`--synthetic N` generates a random in-memory dataset instead (debug /
smoke-test path; used by tests).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=("sam", "depth", "gdino"), default="sam")
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic samples instead of --data")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir (save every --ckpt_every)")
    p.add_argument("--ckpt_every", type=int, default=50)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--image_size", type=int, default=0,
                   help="override model image size (sam synthetic debug)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from inklayer_tpu.parallel.mesh import make_mesh
    from inklayer_tpu.parallel.train import Trainer, sam_mask_loss, silog_loss

    rng = np.random.default_rng(args.seed)
    mesh = make_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp)

    # ---- task setup ------------------------------------------------------
    if args.task == "sam":
        from inklayer_tpu.config import SamConfig
        from inklayer_tpu.models.sam import Sam

        size = args.image_size or 1024
        cfg = (SamConfig(image_size=size, encoder_embed_dim=32,
                         encoder_depth=2, encoder_num_heads=2,
                         encoder_global_attn_indexes=(1,),
                         encoder_window_size=2, prompt_embed_dim=32)
               if args.synthetic and size <= 128 else SamConfig(image_size=size))
        model = Sam(cfg)
        low = cfg.image_size // 4

        def synth(_):
            img = rng.standard_normal(
                (cfg.image_size, cfg.image_size, 3)).astype(np.float32)
            box = np.asarray([4.0, 4.0, cfg.image_size * 0.6,
                              cfg.image_size * 0.5], np.float32)
            mask = np.zeros((low, low), np.float32)
            mask[2: low // 2, 2: low // 2] = 1
            return {"image": img, "boxes": box[None], "mask": mask[None]}

        def load(path):
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB"), np.float32)
            base = path.rsplit(".", 1)[0]
            mask = np.asarray(
                Image.open(f"{base}_mask.png").convert("L").resize((low, low)),
                np.float32)[None] / 255.0
            boxes = np.asarray(json.load(open(f"{base}_boxes.json")),
                               np.float32)[:1]
            return {"image": img, "boxes": boxes, "mask": mask}

        def loss_fn(params, batch):
            def one(img, boxes, target):
                logits, iou = model.apply(params, img[None], boxes)
                return sam_mask_loss(logits[:, 0], iou[:, 0], target)

            return jnp.mean(jax.vmap(one)(
                batch["image"], batch["boxes"], batch["mask"]))

        example = (jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                   jnp.zeros((1, 4)))
        params = model.init(jax.random.key(args.seed), *example)

    elif args.task == "depth":
        from inklayer_tpu.config import DepthConfig
        from inklayer_tpu.models.depth.dpt import DepthAnythingV2

        size = args.image_size or 518
        cfg = (DepthConfig(embed_dim=32, depth=4, num_heads=2, features=16,
                           out_channels=(16, 16, 32, 32),
                           intermediate_layers=(0, 1, 2, 3), input_size=size)
               if args.synthetic and size <= 140 else DepthConfig())
        model = DepthAnythingV2(cfg)

        def synth(_):
            img = rng.standard_normal((size, size, 3)).astype(np.float32)
            d = rng.random((size, size)).astype(np.float32) + 0.1
            return {"image": img, "depth": d}

        def load(path):
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB").resize(
                (size, size)), np.float32) / 255.0
            d = np.load(path.rsplit(".", 1)[0] + "_depth.npy")
            return {"image": img, "depth": d.astype(np.float32)}

        def loss_fn(params, batch):
            def one(img, target):
                pred = model.apply(params, img[None])[0]
                pred = jax.image.resize(pred, target.shape, "bilinear")
                return silog_loss(jax.nn.relu(pred) + 1e-3, target,
                                  target > 0)

            return jnp.mean(jax.vmap(one)(batch["image"], batch["depth"]))

        params = model.init(jax.random.key(args.seed),
                            jnp.zeros((1, size, size, 3)))

    else:  # gdino
        from inklayer_tpu.config import GDinoConfig
        from inklayer_tpu.models.gdino.gdino import GroundingDINO
        from inklayer_tpu.models.gdino.bert import subsentence_masks
        from inklayer_tpu.parallel.detection_loss import detection_loss

        size = args.image_size or 800
        if args.synthetic and size <= 128:
            from tests.test_gdino import TINY as cfg  # pragma: no cover
        else:
            cfg = GDinoConfig()
        model = GroundingDINO(cfg)
        ids = np.zeros((1, 6), np.int32)
        ids[0] = [101, 4874, 1012, 102, 0, 0]
        attn, pos = subsentence_masks(ids)

        def synth(_):
            img = rng.standard_normal((size, size, 3)).astype(np.float32)
            boxes = rng.random((4, 4)).astype(np.float32) * 0.4 + 0.2
            return {"image": img, "boxes": boxes}

        def load(path):
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGB").resize(
                (size, size)), np.float32) / 255.0
            boxes = np.asarray(json.load(
                open(path.rsplit(".", 1)[0] + "_boxes.json")), np.float32)
            return {"image": img, "boxes": boxes}

        def loss_fn(params, batch):
            def one(img, gt_boxes):
                logits, boxes = model.apply(
                    params, img[None], jnp.zeros((1, size, size), bool),
                    jnp.asarray(ids), jnp.asarray(attn),
                    jnp.asarray(pos.astype(np.int32)))
                m = gt_boxes.shape[0]
                # caption "object": positive map points at token 1
                pos_maps = jnp.zeros((1, m, cfg.max_text_len)).at[..., 1].set(1.0)
                valid = jnp.ones((1, m), bool)
                total, _metrics = detection_loss(logits, boxes, gt_boxes[None],
                                                 pos_maps, valid)
                return total

            return jnp.mean(jax.vmap(one)(batch["image"], batch["boxes"]))

        params = model.init(
            jax.random.key(args.seed),
            jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size), bool),
            jnp.asarray(ids), jnp.asarray(attn),
            jnp.asarray(pos.astype(np.int32)))

    # ---- data ------------------------------------------------------------
    if args.synthetic:
        samples = [synth(i) for i in range(args.synthetic)]
    else:
        if not args.data:
            raise SystemExit("--data DIR or --synthetic N required")
        paths = sorted(glob.glob(os.path.join(args.data, "*.png")))
        paths = [p for p in paths if "_mask" not in p and "_depth" not in p]
        samples = [load(p) for p in paths]
        if not samples:
            raise SystemExit(f"no samples under {args.data}")

    def batches():
        i = 0
        while True:
            idx = [(i + j) % len(samples) for j in range(args.batch)]
            yield {k: np.stack([samples[j][k] for j in idx])
                   for k in samples[0]}
            i += args.batch

    # ---- train loop ------------------------------------------------------
    if args.resume:
        from inklayer_tpu.io.checkpoint import load_params

        params = load_params(args.resume, template=params)
        print(f"resumed from {args.resume}")

    trainer = Trainer(loss_fn, params, mesh,
                      optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                            optax.adamw(args.lr)))
    it = batches()
    t0 = time.time()
    for step in range(1, args.steps + 1):
        loss = trainer.train_step(next(it))
        if step == 1 or step % 10 == 0 or step == args.steps:
            print(f"step {step:5d}  loss {float(loss):.5f}  "
                  f"({(time.time() - t0) / step:.2f}s/step)", flush=True)
        if args.ckpt and (step % args.ckpt_every == 0 or step == args.steps):
            from inklayer_tpu.io.checkpoint import save_params

            save_params(trainer.params, os.path.join(args.ckpt, f"step_{step}"))
    print("done.")
    return trainer


if __name__ == "__main__":
    main()
