"""Host-side sampling chain over the single logits row per slot.

Rebuilds the llama.cpp common_sampler chain the reference drives
(SURVEY.md section 2b "Sampling"; cortex call sites common_sampler_init/
sample/accept at /root/reference/src/llama_server_context.cc:625-628,
1680-1690, param wiring at :452-483, defaults at
src/chat_completion_request.h:60-107):

  logit_bias -> penalties (repeat/freq/present over penalty_last_n)
  -> grammar mask -> top_k -> typical -> top_p -> min_p -> temp/dynatemp
  -> seeded dist sample   (or mirostat v1/v2, or greedy when temp <= 0)

Runs in numpy on the host: one row of logits per active slot per step
(SURVEY.md section 7 "Host<->device per-token round-trip").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SamplingParams:
    # defaults mirror the reference's request parsing
    # (chat_completion_request.h:60-107 + llama_server_context.cc:448-483)
    temperature: float = 0.8
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typical_p: float = 1.0
    repeat_last_n: int = 64
    repeat_penalty: float = 1.1
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    seed: int | None = None
    n_probs: int = 0
    min_keep: int = 1
    logit_bias: dict[int, float] = field(default_factory=dict)
    grammar: str = ""
    ignore_eos: bool = False


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    e = np.exp(x - m)
    return e / e.sum()


@dataclass
class TokenProb:
    token: int
    logprob: float


class Sampler:
    """Per-slot sampler state machine (reference: common_sampler per slot,
    llama_client_slot.h:136-137)."""

    def __init__(self, params: SamplingParams, n_vocab: int, eos_id: int = -1,
                 eog_ids: tuple = ()):
        self.params = params
        self.n_vocab = n_vocab
        self.eos_id = eos_id
        # FULL end-of-generation set (eos + eot + eom + flagged extras):
        # ignore_eos must ban every token the engine treats as EOG, or a
        # grammar/model that ranks a non-eos EOG first still stops
        self.eog_ids = tuple(t for t in (eog_ids or (eos_id,)) if t >= 0)
        seed = params.seed if params.seed is not None and params.seed >= 0 else None
        self.rng = np.random.default_rng(seed)
        self.prev: list[int] = []
        self.mu: float | None = None  # mirostat state
        self.grammar_matcher = None  # set by the serving layer when active
        self.last_probs: list[TokenProb] = []

    def reset(self) -> None:
        self.prev.clear()
        self.mu = None
        self.last_probs = []
        if self.grammar_matcher is not None:
            self.grammar_matcher.reset()

    def accept(self, token: int, apply_grammar: bool = True) -> None:
        self.prev.append(token)
        if self.grammar_matcher is not None and apply_grammar:
            self.grammar_matcher.accept(token)

    # -- chain stages --------------------------------------------------------
    def _apply_penalties(self, logits: np.ndarray) -> None:
        p = self.params
        last_n = p.repeat_last_n
        if last_n == 0 or (
            p.repeat_penalty == 1.0 and p.frequency_penalty == 0.0 and p.presence_penalty == 0.0
        ):
            return
        window = self.prev[-last_n:] if last_n > 0 else self.prev
        if not window:
            return
        toks, counts = np.unique(np.asarray(window, np.int64), return_counts=True)
        vals = logits[toks]
        if p.repeat_penalty != 1.0:
            vals = np.where(vals <= 0, vals * p.repeat_penalty, vals / p.repeat_penalty)
        vals = vals - counts * p.frequency_penalty
        vals = vals - (counts > 0) * p.presence_penalty
        logits[toks] = vals

    @staticmethod
    def _top_k(logits: np.ndarray, k: int) -> np.ndarray:
        if k <= 0 or k >= logits.size:
            return logits
        kth = np.partition(logits, -k)[-k]
        out = np.where(logits < kth, -np.inf, logits)
        return out

    @staticmethod
    def _top_p(logits: np.ndarray, top_p: float, min_keep: int) -> np.ndarray:
        if top_p >= 1.0:
            return logits
        order = np.argsort(-logits, kind="stable")
        probs = _softmax(logits[order])
        cum = np.cumsum(probs)
        keep = cum - probs < top_p  # keep tokens until cumulative mass reaches top_p
        keep[: max(min_keep, 1)] = True
        cut = order[~keep]
        logits = logits.copy()
        logits[cut] = -np.inf
        return logits

    @staticmethod
    def _min_p(logits: np.ndarray, min_p: float, min_keep: int) -> np.ndarray:
        if min_p <= 0.0:
            return logits
        probs = _softmax(logits)
        thresh = probs.max() * min_p
        mask = probs < thresh
        if (~mask).sum() < min_keep:
            order = np.argsort(-logits, kind="stable")
            mask[order[:min_keep]] = False
        logits = logits.copy()
        logits[mask] = -np.inf
        return logits

    @staticmethod
    def _typical(logits: np.ndarray, typ_p: float, min_keep: int) -> np.ndarray:
        if typ_p >= 1.0:
            return logits
        probs = _softmax(logits)
        with np.errstate(divide="ignore"):
            logp = np.log(probs)
        ent = -np.nansum(np.where(probs > 0, probs * logp, 0.0))
        shifted = np.abs(-logp - ent)
        order = np.argsort(shifted, kind="stable")
        cum = np.cumsum(probs[order])
        n_keep = max(int(np.searchsorted(cum, typ_p) + 1), min_keep)
        cut = order[n_keep:]
        logits = logits.copy()
        logits[cut] = -np.inf
        return logits

    def _temp(self, logits: np.ndarray) -> np.ndarray:
        p = self.params
        t = p.temperature
        if p.dynatemp_range > 0:
            # entropy-scaled dynamic temperature (public dynatemp algorithm)
            lo, hi = max(0.0, t - p.dynatemp_range), t + p.dynatemp_range
            probs = _softmax(logits)
            nz = probs[probs > 0]
            ent = -np.sum(nz * np.log(nz))
            max_ent = np.log(max((np.isfinite(logits)).sum(), 1))
            ratio = (ent / max_ent) if max_ent > 0 else 1.0
            t = lo + (hi - lo) * (ratio ** p.dynatemp_exponent)
        return logits / max(t, 1e-6)

    # -- main entry -----------------------------------------------------------
    def sample(self, logits: np.ndarray) -> int:
        p = self.params
        logits = np.asarray(logits, np.float32).copy()

        for tok, bias in p.logit_bias.items():
            if 0 <= int(tok) < logits.size:
                if bias <= -100.0:  # OpenAI convention: -100 bans the token
                    logits[int(tok)] = -np.inf
                else:
                    logits[int(tok)] += bias
        pre_ban = None
        if p.ignore_eos:
            pre_ban = {t: logits[t] for t in self.eog_ids if t < logits.size}
            for t in self.eog_ids:
                if t < logits.size:
                    logits[t] = -np.inf

        self._apply_penalties(logits)

        if self.grammar_matcher is not None:
            mask = self.grammar_matcher.allowed_mask()
            if mask is not None:
                logits = np.where(mask, logits, -np.inf)
                if pre_ban and not np.isfinite(logits).any():
                    # finite grammar with only EOG legal: the ignore_eos
                    # ban yields so the grammar can terminate (otherwise
                    # argmax picks token 0, which is grammar-illegal and
                    # drives the matcher into the dead state)
                    for t, v in pre_ban.items():
                        if mask[t]:
                            logits[t] = v

        if p.temperature <= 0:
            token = int(np.argmax(logits))
            self._capture_probs(logits, token)
            return token

        if p.mirostat == 1:
            token = self._mirostat_v1(logits)
        elif p.mirostat == 2:
            token = self._mirostat_v2(logits)
        else:
            logits = self._top_k(logits, p.top_k)
            logits = self._typical(logits, p.typical_p, p.min_keep)
            logits = self._top_p(logits, p.top_p, p.min_keep)
            logits = self._min_p(logits, p.min_p, p.min_keep)
            logits = self._temp(logits)
            probs = _softmax(logits)
            token = int(self.rng.choice(probs.size, p=probs))
        self._capture_probs(logits, token)
        return token

    def _capture_probs(self, final_logits: np.ndarray, token: int) -> None:
        n = self.params.n_probs
        self.last_probs = []
        if n <= 0:
            return
        probs = _softmax(final_logits)
        top = np.argsort(-probs, kind="stable")[:n]
        with np.errstate(divide="ignore"):
            self.last_probs = [TokenProb(int(t), float(np.log(probs[t]))) for t in top]
        if token not in [tp.token for tp in self.last_probs]:
            self.last_probs.append(TokenProb(token, float(np.log(max(probs[token], 1e-30)))))

    def _mirostat_v1(self, logits: np.ndarray) -> int:
        p = self.params
        if self.mu is None:
            self.mu = 2.0 * p.mirostat_tau
        probs_full = _softmax(logits)
        order = np.argsort(-logits, kind="stable")[:100]
        sp = probs_full[order]
        # estimate s_hat from the top tokens (zipf exponent)
        i = np.arange(1, len(order))
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ = np.log((i + 1) / i)
            b_ = np.log(sp[:-1] / sp[1:])
        valid = np.isfinite(b_)
        s_hat = float(np.sum(t_[valid] * b_[valid]) / np.sum(t_[valid] * t_[valid])) if valid.any() else 1.0
        eps_hat = s_hat - 1.0
        n = logits.size
        k = ((eps_hat * (2.0 ** self.mu)) / (1 - n ** (-eps_hat))) ** (1.0 / max(s_hat, 1e-5)) if eps_hat > 0 else float(n)
        k = int(np.clip(k, 1, n))
        cut = self._top_k(logits, k)
        cut = cut / max(p.temperature, 1e-6)
        probs = _softmax(cut)
        token = int(self.rng.choice(probs.size, p=probs))
        surprise = -np.log2(max(probs_full[token], 1e-30))
        self.mu -= p.mirostat_eta * (surprise - p.mirostat_tau)
        return token

    def _mirostat_v2(self, logits: np.ndarray) -> int:
        p = self.params
        if self.mu is None:
            self.mu = 2.0 * p.mirostat_tau
        scaled = logits / max(p.temperature, 1e-6)
        probs = _softmax(scaled)
        with np.errstate(divide="ignore"):
            surprises = -np.log2(np.maximum(probs, 1e-30))
        mask = surprises > self.mu
        if mask.all():
            mask[np.argmax(probs)] = False
        kept = np.where(mask, -np.inf, scaled)
        kp = _softmax(kept)
        token = int(self.rng.choice(kp.size, p=kp))
        surprise = -np.log2(max(probs[token], 1e-30))
        self.mu -= p.mirostat_eta * (surprise - p.mirostat_tau)
        return token
