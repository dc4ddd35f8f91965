"""Serving-layer request/result types.

Mirrors the task/result flow of the reference's LlamaServerContext
(SURVEY.md section 3.2/3.3): RequestCompletion enqueues a task, the
background engine loop streams TaskResults back per token.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field

from ..sampling import SamplingParams


class TaskType(enum.Enum):
    COMPLETION = "completion"
    CANCEL = "cancel"


class StopReason(enum.Enum):
    NONE = "none"
    EOS = "eos"  # end-of-generation token
    WORD = "word"  # stop string hit
    LIMIT = "limit"  # n_predict budget or context limit


@dataclass
class CompletionParams:
    """Per-request knobs (request > load-time > default precedence,
    SURVEY.md section 5 "Config / flag system")."""

    prompt: str | list[int] = ""
    n_predict: int = 500  # reference default max_tokens 500 (chat_completion_request.h:60)
    stream: bool = False
    stop: list[str] = field(default_factory=list)
    sampling: SamplingParams = field(default_factory=SamplingParams)
    cache_prompt: bool = True
    n_keep: int = 0  # tokens to pin at the head on context shift
    embedding: bool = False
    # self-extend group attention (reference README.md:141-142)
    grp_attn_n: int = 1
    grp_attn_w: int = 512
    # infill / FIM
    input_prefix: str = ""
    input_suffix: str = ""
    infill: bool = False
    json_schema: dict | None = None
    # multimodal: decoded image bytes; the prompt references them with
    # [img-N] markers (reference llama_engine.cc:853-918)
    images: list = field(default_factory=list)
    # shared KV system prefix; applied when all slots are idle (reference
    # ProcessSystemPromptData, llama_server_context.cc:668-680,1187-1188)
    system_prompt: str | None = None


@dataclass
class Timings:
    """Per-request wall-clock metrics (reference llama_client_slot.cc:62-94)."""

    prompt_n: int = 0
    prompt_ms: float = 0.0
    predicted_n: int = 0
    predicted_ms: float = 0.0

    def to_dict(self) -> dict:
        return {
            "prompt_n": self.prompt_n,
            "prompt_ms": round(self.prompt_ms, 2),
            "prompt_per_token_ms": round(self.prompt_ms / self.prompt_n, 3) if self.prompt_n else 0.0,
            "prompt_per_second": round(1000.0 * self.prompt_n / self.prompt_ms, 2) if self.prompt_ms else 0.0,
            "predicted_n": self.predicted_n,
            "predicted_ms": round(self.predicted_ms, 2),
            "predicted_per_token_ms": round(self.predicted_ms / self.predicted_n, 3) if self.predicted_n else 0.0,
            "predicted_per_second": round(1000.0 * self.predicted_n / self.predicted_ms, 2) if self.predicted_ms else 0.0,
        }


@dataclass
class TaskResult:
    task_id: int
    error: bool = False
    stop: bool = False  # final result for this task
    text: str = ""  # delta text (stream) or full text (final, non-stream)
    error_message: str = ""
    stop_reason: StopReason = StopReason.NONE
    stopping_word: str = ""
    tokens_predicted: int = 0
    tokens_evaluated: int = 0
    truncated: bool = False
    timings: dict = field(default_factory=dict)
    probs: list = field(default_factory=list)  # [(token_id, piece, logprob, top[(tok,piece,lp)])]
    embedding: list | None = None


@dataclass
class Task:
    id: int
    type: TaskType
    params: CompletionParams | None = None
    target_id: int = -1  # for CANCEL
    t_submitted: float = field(default_factory=time.time)
    # memoized prompt token ids: the engine encodes once (slot routing) and
    # reuses at launch instead of tokenizing the prompt twice per request
    prompt_ids: list | None = None
