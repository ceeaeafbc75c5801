"""vision-assist-tpu: a TPU-native (JAX/XLA/Pallas) walkable-path guidance
framework with the capabilities of the reference Vision Assist pipeline.

Layers (see SURVEY.md §7):
  config / types      typed configuration and the core data model
  ops                 on-chip array kernels (letterbox, NMS, masks, occupancy,
                      penalty field, peaks, blur)
  models              Flax YOLO-seg model family, decode, training
  planning            pathfinding: on-chip wavefront engine + exact host twin
  semantics           path sectioning, corners, instruction synthesis
  pipeline            the jitted frame step and the public FrameProcessor API
  parallel            device mesh and sharding specs (multi-stream batching)
  io                  MockCamera, scenario fixtures, visualiser
  golden              exact host twin of the reference (parity oracle)
"""

__version__ = "0.1.0"

from vision_assist_tpu.config import PipelineConfig, replay_config
from vision_assist_tpu.types import Cell, Coordinate, FinalAnswer, Instruction, Peak

__all__ = [
    "PipelineConfig",
    "replay_config",
    "Cell",
    "Coordinate",
    "FinalAnswer",
    "Instruction",
    "Peak",
    "__version__",
]
