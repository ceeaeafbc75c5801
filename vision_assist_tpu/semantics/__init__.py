from vision_assist_tpu.semantics.sections import AnalysedPath, PathSection, build_path
from vision_assist_tpu.semantics.analyser import InstructionEngine

__all__ = ["AnalysedPath", "PathSection", "build_path", "InstructionEngine"]
