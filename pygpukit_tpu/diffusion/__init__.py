from .pipeline import (
    FluxPipeline, PipelineOutput, PixArtPipeline, SD3Pipeline,
    Text2ImagePipeline,
)
from .schedulers import (
    SCHEDULERS, DDIMScheduler, EulerDiscreteScheduler, FlowMatchingScheduler,
)

__all__ = [
    "FluxPipeline", "PipelineOutput", "PixArtPipeline", "SD3Pipeline",
    "Text2ImagePipeline", "SCHEDULERS", "DDIMScheduler",
    "EulerDiscreteScheduler", "FlowMatchingScheduler",
]
