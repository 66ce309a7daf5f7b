"""Multi-stream / multi-chip scaling (the axis the reference lacks).

The reference is single-process, single-GPU, one stream (SURVEY.md §2:
no data/tensor/pipeline parallelism, no collectives). The TPU-native
scaling axis is *stream parallelism*: many independent video streams,
each with its own tracker state, batched into one device step and sharded
across chips over a ``jax.sharding.Mesh`` — tracking state is per-stream so
the hot path needs **zero collectives** (detection batches ride the batch
axis of the same convolutions).
"""

from .multistream import MultiStreamPipeline, make_mesh, make_stream_mesh
from .pipeline_parallel import PipelineParallelDetector, split_stage_params
from .tensor_parallel import replicate_params, shard_detector_params

__all__ = ["MultiStreamPipeline", "make_mesh", "make_stream_mesh",
           "PipelineParallelDetector", "split_stage_params",
           "replicate_params", "shard_detector_params"]
