from scene_generation_tpu.trainer.train_state import (
    TrainState, create_train_state)
from scene_generation_tpu.trainer.step import make_train_step, TrainMetrics
from scene_generation_tpu.trainer.pools import VectorPoolState, pool_query

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "TrainMetrics", "VectorPoolState", "pool_query"]
