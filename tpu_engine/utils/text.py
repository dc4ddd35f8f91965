"""Text utilities: stop-string scanning and misc helpers.

Stop scanning mirrors the reference's FindStoppingStrings full/partial
logic (/root/reference/src/llama_server_context.cc:687-714): a full match
truncates the output; a partial match (suffix of the generated text that is
a prefix of a stop word) holds those characters back from streaming.
"""

from __future__ import annotations

import base64
import secrets


def find_full_stop(text: str, stops: list[str], search_from: int = 0) -> tuple[int, str]:
    """Earliest full stop-word occurrence at or after search_from.
    Returns (index, word) or (-1, "")."""
    best = -1
    best_word = ""
    for w in stops:
        if not w:
            continue
        start = max(0, search_from - len(w) + 1)
        i = text.find(w, start)
        if i != -1 and (best == -1 or i < best):
            best = i
            best_word = w
    return best, best_word


def partial_stop_len(text: str, stops: list[str]) -> int:
    """Length of the longest suffix of `text` that is a proper prefix of any
    stop word (characters that must be held back from streaming)."""
    best = 0
    for w in stops:
        if not w:
            continue
        maxl = min(len(w) - 1, len(text))
        for l in range(maxl, 0, -1):
            if text.endswith(w[:l]):
                best = max(best, l)
                break
    return best


def random_id(n: int = 24) -> str:
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    return "".join(secrets.choice(alphabet) for _ in range(n))


def floats_to_base64(vec) -> str:
    """Embedding base64 encoding (reference llama_utils.h:33-39 + engine
    encoding_format handling, llama_engine.cc:92-114)."""
    import numpy as np

    return base64.b64encode(np.asarray(vec, np.float32).tobytes()).decode("ascii")
