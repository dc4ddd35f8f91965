from .engine import InferenceEngine
from .types import CompletionParams, StopReason, Task, TaskResult, TaskType

__all__ = [
    "InferenceEngine", "CompletionParams", "StopReason", "Task", "TaskResult", "TaskType",
]
