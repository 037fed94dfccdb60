"""Fine-tune a ResNet classifier on GT object crops (reference
``scripts/train_accuracy_net.py:156-276``).

The resulting accuracy net measures object classification accuracy of
generated crops (``sample_images.py:224-239``). Crops are taken with the
differentiable ROI crop at --crop_size (reference uses 224), labels are the
contiguous class ids. Data parallelism comes from the same mesh helpers as
the main trainer (the reference's one multi-GPU touchpoint was an optional
DataParallel here, train_accuracy_net.py:257-259).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coco_dir", default="datasets/coco")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=128)
    p.add_argument("--small_net", action="store_true",
                   help="small ResNet (stage sizes 1,1,1,1) at 32px crops "
                        "on the FULL data config — matches sample_images "
                        "--accuracy_tiny for environments without the "
                        "pretrained resnet101 checkpoint")
    p.add_argument("--tiny", action="store_true",
                   help="small resnet + small crops (CI)")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--save_path", default="models/accuracy_net")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    a = parse_args()
    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp
    from scene_generation_tpu.config import Config, tiny_config
    from scene_generation_tpu.data.loader import DataLoader
    from scene_generation_tpu.models.resnet import (ResNet, load_torch_resnet,
                                                    resnet101)
    from scene_generation_tpu.ops.crop import crop_bbox_batch

    cfg = tiny_config() if a.tiny else Config()
    if a.synthetic:
        from scene_generation_tpu.data.synthetic import SyntheticDataset
        dset = SyntheticDataset(cfg, size=a.synthetic_size, seed=a.seed)
        num_classes = cfg.model.num_objs
    else:
        from scene_generation_tpu.data.coco import CocoSceneGraphDataset
        d = cfg.data
        dset = CocoSceneGraphDataset(
            image_dir=os.path.join(a.coco_dir, "images/train2017"),
            instances_json=os.path.join(
                a.coco_dir, "annotations/instances_train2017.json"),
            stuff_json=os.path.join(
                a.coco_dir, "annotations/stuff_train2017.json"),
            image_size=d.image_size, mask_size=d.mask_size,
            max_samples=a.num_samples, seed=a.seed)
        num_classes = dset.num_classes
    num_classes = a.num_classes or num_classes

    small = a.tiny or a.small_net
    crop = 32 if small else a.crop_size
    model = (ResNet(stage_sizes=(1, 1, 1, 1), num_classes=num_classes)
             if small else resnet101(num_classes))
    rng = jax.random.PRNGKey(a.seed)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, crop, crop, 3)), train=False))(rng)
    variables = dict(variables)
    if not small:
        variables, loaded = load_torch_resnet(variables, skip_fc=True)
        print(f"pretrained resnet101 weights loaded: {loaded}")

    tx = optax.adam(a.learning_rate)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, boxes, objs,
                   obj_mask):
        from scene_generation_tpu.ops.images import wire_to_float
        n, o = objs.shape
        crops = crop_bbox_batch(wire_to_float(imgs), boxes, crop).reshape(
            n * o, crop, crop, 3)
        labels = objs.reshape(n * o)
        w = obj_mask.reshape(n * o) * (labels != 0)

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, crops, train=True,
                mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * w) \
                / jnp.maximum(jnp.sum(w), 1.0)
            return loss, (mut["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, acc

    loader = DataLoader(dset, batch_size=a.batch_size,
                        max_objs=cfg.data.max_objs,
                        max_triples=cfg.data.max_triples, num_workers=4,
                        seed=a.seed)
    params, batch_stats = variables["params"], variables["batch_stats"]
    step = 0
    for epoch in range(a.epochs):
        for batch in loader:
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, jnp.asarray(batch.imgs),
                jnp.asarray(batch.boxes), jnp.asarray(batch.objs),
                jnp.asarray(batch.obj_mask))
            step += 1
            if step % 10 == 0 or step == 1:
                print(f"epoch {epoch} step {step}: loss {float(loss):.4f} "
                      f"acc {float(acc):.4f}")

    path = os.path.abspath(a.save_path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ocp.PyTreeCheckpointer().save(
        path, jax.device_get({"params": params, "batch_stats": batch_stats}),
        force=True)
    print(f"saved accuracy net to {path} (final train acc "
          f"{float(acc):.4f})")


if __name__ == "__main__":
    main()
