from scene_generation_tpu.ops.pallas.compositor import (
    masks_to_layout_pallas, pallas_available)

__all__ = ["masks_to_layout_pallas", "pallas_available"]
