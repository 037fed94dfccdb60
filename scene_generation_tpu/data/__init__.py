from scene_generation_tpu.data.batching import Batch, pad_example, collate
from scene_generation_tpu.data.synthetic import synthetic_batch, synthetic_vocab

__all__ = ["Batch", "pad_example", "collate", "synthetic_batch",
           "synthetic_vocab"]
