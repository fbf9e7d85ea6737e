from .pipeline import (
    FluxPipeline, PipelineOutput, PixArtPipeline, Text2ImagePipeline,
)
from .schedulers import (
    SCHEDULERS, DDIMScheduler, EulerDiscreteScheduler, FlowMatchingScheduler,
)

__all__ = [
    "FluxPipeline", "PipelineOutput", "PixArtPipeline", "Text2ImagePipeline",
    "SCHEDULERS", "DDIMScheduler", "EulerDiscreteScheduler",
    "FlowMatchingScheduler",
]
