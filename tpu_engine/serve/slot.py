"""Per-sequence slot state machine.

Mirrors the semantics (not the structure) of the reference's
LlamaClientSlot (/root/reference/src/llama_client_slot.h:41-50 state/command
enums, :119 cache_tokens, :136 per-slot sampler; SURVEY.md section 2a).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field

from ..sampling import Sampler
from ..tokenizer import StreamDetokenizer
from .types import CompletionParams, StopReason, Timings


class SlotState(enum.Enum):
    IDLE = "idle"
    PROCESSING_PROMPT = "prompt"
    GENERATING = "generating"


@dataclass
class Slot:
    id: int
    n_ctx: int  # per-slot context cells (n_ctx_total / n_parallel, ref :250-262)
    state: SlotState = SlotState.IDLE
    task_id: int = -1
    params: CompletionParams | None = None
    sampler: Sampler | None = None
    detok: StreamDetokenizer | None = None

    prompt_tokens: list[int] = field(default_factory=list)
    cache_tokens: list[int] = field(default_factory=list)  # tokens in KV cells
    # multimodal prompt: interleaved ("t", [ids]) / ("i", embd [n, E])
    # segments; empty means text-only (walk prompt_tokens directly)
    segments: list = field(default_factory=list)
    seg_idx: int = 0
    seg_off: int = 0
    prompt_cells: int = 0  # total cells the prompt occupies (incl. images)
    n_past: int = 0  # occupied cells (== host view of cache.lengths[id])
    n_prompt_done: int = 0  # prompt tokens already decoded

    generated_text: str = ""
    sent_offset: int = 0  # chars of generated_text already emitted
    generated_tokens: list[int] = field(default_factory=list)
    n_remaining: int = -1
    stop_reason: StopReason = StopReason.NONE
    stopping_word: str = ""
    truncated: bool = False
    probs_out: list = field(default_factory=list)
    probs_sent: int = 0  # probs already emitted in stream partials
    # (reference sent_token_probs_index, llama_server_context.cc:937-948)

    # on-device grammar: absolute GrammarBank row of the slot's CURRENT
    # DFA state (host mirror of DeviceSamplerState.gstate, advanced as
    # tokens are processed); None = no grammar or host-lane grammar
    gstate: int | None = None

    # embeddings
    embed_sum: list | None = None
    embed_count: int = 0

    # timings (reference llama_client_slot.cc:55-76)
    t_start_prompt: float = 0.0
    t_start_gen: float = 0.0
    timings: Timings = field(default_factory=Timings)
    t_last_used: float = field(default_factory=time.time)

    def available(self) -> bool:
        return self.state == SlotState.IDLE

    def is_processing(self) -> bool:
        return self.state != SlotState.IDLE

    def has_budget(self) -> bool:
        if self.params is None or self.params.n_predict < 0:
            return True
        return self.n_remaining != 0

    def release(self) -> None:
        self.state = SlotState.IDLE
        self.task_id = -1
        self.t_last_used = time.time()

    def launch(self, task_id: int, params: CompletionParams, sampler: Sampler,
               detok: StreamDetokenizer) -> None:
        self.task_id = task_id
        self.params = params
        self.sampler = sampler
        self.detok = detok
        self.state = SlotState.PROCESSING_PROMPT
        self.prompt_tokens = []
        self.n_prompt_done = 0
        self.generated_text = ""
        self.sent_offset = 0
        self.generated_tokens = []
        self.n_remaining = params.n_predict
        self.stop_reason = StopReason.NONE
        self.stopping_word = ""
        self.truncated = False
        self.probs_out = []
        self.probs_sent = 0
        self.gstate = None
        self.embed_sum = None
        self.embed_count = 0
        self.timings = Timings()
        self.t_start_prompt = time.time()
