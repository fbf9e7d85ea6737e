from .pipeline import FluxPipeline, PipelineOutput, Text2ImagePipeline
from .schedulers import (
    SCHEDULERS, DDIMScheduler, EulerDiscreteScheduler, FlowMatchingScheduler,
)

__all__ = [
    "FluxPipeline", "PipelineOutput", "Text2ImagePipeline",
    "SCHEDULERS", "DDIMScheduler", "EulerDiscreteScheduler",
    "FlowMatchingScheduler",
]
