"""Host data-pipeline throughput (VERDICT r1 weak #6 / item 9).

The measured full adversarial step is 59.9 ms at batch 12 all-bf16 with
the factored stem (~200 img/s; forced-readback timing, RESULTS.md §22 —
round-1's "81-95 ms" figure was a dispatch-only artifact, disavowed in
§8). The
loader does PIL JPEG decode + resize + RLE mask rasterization per
example; on a real (multi-core) TPU host the process-worker loader must
deliver >= 2x that rate or the TPU starves silently. Dev/CI boxes can
have very few cores (this build VM has ONE), so the absolute bar is
asserted only when >= 4 cores exist; the parallel-efficiency floor
versus measured serial throughput is asserted everywhere.
"""
import os
import time

import pytest

from scene_generation_tpu.data.coco import CocoSceneGraphDataset
from scene_generation_tpu.data.fake_coco import make_fake_coco
from scene_generation_tpu.data.loader import DataLoader

TRAIN_IMGS_PER_SEC = 200.0   # measured, 1x v5e, batch 12 bf16 factored
#                              stem (59.9 ms/step, RESULTS.md §22)
HEADROOM = 2.0
WORKERS = 4


@pytest.fixture(scope="module")
def dset(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_tp")
    # COCO-ish decode cost: 480x360 JPEGs resized down to 128x128.
    paths = make_fake_coco(str(root), num_images=48, image_size=(480, 360),
                           seed=0)
    return CocoSceneGraphDataset(
        image_dir=paths["image_dir"], instances_json=paths["instances_json"],
        stuff_json=paths["stuff_json"], image_size=(128, 128), mask_size=32,
        min_object_size=0.01, min_objects_per_image=2,
        max_objects_per_image=8, seed=0)


@pytest.fixture(scope="module")
def serial_rate(dset):
    for i in range(len(dset)):     # warm page cache / lazy imports
        dset[i]
    t0 = time.perf_counter()
    for i in range(len(dset)):
        dset[i]
    return len(dset) / (time.perf_counter() - t0)


def _measure(loader, epochs=2):
    n_warm = sum(b.imgs.shape[0] for b in loader)   # warm epoch
    assert n_warm >= 36
    imgs = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in loader:
            imgs += b.imgs.shape[0]
    return imgs / (time.perf_counter() - t0)


@pytest.mark.parametrize("worker_type", ["thread", "process"])
def test_loader_throughput(dset, serial_rate, worker_type):
    loader = DataLoader(dset, batch_size=12, max_objs=9, max_triples=16,
                        shuffle=True, num_workers=WORKERS, seed=0,
                        worker_type=worker_type)
    try:
        rate = _measure(loader)
    finally:
        loader.close()
    cores = os.cpu_count() or 1
    print(f"loader[{worker_type}]: {rate:.1f} img/s "
          f"(serial {serial_rate:.1f}, {cores} cores)")

    # Parallel-efficiency floor: the machinery (queueing, collate, IPC)
    # must not eat the parallelism. Scales with available cores.
    floor = 0.35 * serial_rate * min(WORKERS, cores)
    assert rate >= floor, (
        f"{worker_type} loader {rate:.1f} img/s < efficiency floor "
        f"{floor:.1f} (serial {serial_rate:.1f} x {min(WORKERS, cores)} "
        f"cores x 0.35)")

    # The absolute production bar, only meaningful with real parallelism.
    if worker_type == "process" and cores >= 4:
        assert rate >= HEADROOM * TRAIN_IMGS_PER_SEC, (
            f"process loader {rate:.1f} img/s < "
            f"{HEADROOM * TRAIN_IMGS_PER_SEC}; the TPU would starve")
