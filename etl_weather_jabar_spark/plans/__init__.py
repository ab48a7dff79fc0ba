from .pipelines import recap_stage, transform_stage

__all__ = ["recap_stage", "transform_stage"]
