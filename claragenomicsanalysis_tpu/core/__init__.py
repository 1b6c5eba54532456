from .status import StatusType, AlignmentState, AlignmentType, OutputType
from .types import Anchor, Overlap, SketchElement
from .config import AlignerConfig, BatchSize, PoaScores, MapperConfig

__all__ = [
    "StatusType", "AlignmentState", "AlignmentType", "OutputType",
    "Anchor", "Overlap", "SketchElement",
    "AlignerConfig", "BatchSize", "PoaScores", "MapperConfig",
]
