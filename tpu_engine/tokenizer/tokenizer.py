"""Tokenizers constructed from GGUF metadata.

TPU-native replacement for the llama.cpp vocab/tokenizer surface the
reference consumes (SURVEY.md section 2b "Tokenizer & vocab"; cortex call
sites: common_tokenize at /root/reference/src/llama_server_context.cc:395-410,
common_token_to_piece at :75, vocab probing at :235-239, FIM specials at
:1401-1408). Implements:

  - "llama" (SentencePiece-style): greedy highest-score bigram merging over
    UTF-8 characters with byte fallback <0xXX>.
  - "gpt2" (byte-level BPE): byte->unicode remap, regex pre-tokenization,
    rank-ordered merges.
  - special/control token partitioning before tokenization
  - incremental UTF-8-safe detokenization for streaming (the reference's
    incomplete-UTF-8 hold-back, llama_server_context.cc:727-747)
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from enum import IntEnum

import numpy as np

from .pretokenizers import PreTokenizer


class TokenType(IntEnum):
    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


def _gpt2_byte_to_unicode() -> dict[int, str]:
    """The GPT-2 byte<->unicode bijection (public algorithm)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_BYTE_TO_UNI = _gpt2_byte_to_unicode()
_UNI_TO_BYTE = {v: k for k, v in _BYTE_TO_UNI.items()}

SPIECE_UNDERLINE = "▁"  # ▁


@dataclass(eq=False)  # identity hash/eq: one tokenizer per loaded model
class Tokenizer:       # (weak-keyed caches like grammar._TRIE_CACHE key on it)
    model: str  # "llama" | "gpt2" | "bert"
    tokens: list[str]
    scores: np.ndarray | None
    token_types: np.ndarray
    merges: list[str] = field(default_factory=list)
    pre: str = "default"  # tokenizer.ggml.pre split-regex variant
    bos_id: int = -1
    eos_id: int = -1
    eot_id: int = -1
    eom_id: int = -1
    unk_id: int = -1
    pad_id: int = -1
    add_bos: bool = False
    add_eos: bool = False
    add_space_prefix: bool = True
    # FIM specials (infill), SURVEY 2b: llama_vocab_fim_pre/suf/mid
    fim_pre_id: int = -1
    fim_suf_id: int = -1
    fim_mid_id: int = -1

    def __post_init__(self):
        self._piece_to_id = {p: i for i, p in enumerate(self.tokens)}
        self._special_ids = {
            i
            for i, t in enumerate(self.token_types)
            if t in (TokenType.CONTROL, TokenType.USER_DEFINED)
        }
        # longest-first special token matcher
        self._special_pieces = sorted(
            ((self.tokens[i], i) for i in self._special_ids if self.tokens[i]),
            key=lambda kv: -len(kv[0]),
        )
        self._byte_tokens: dict[int, int] = {}
        for i, t in enumerate(self.token_types):
            if t == TokenType.BYTE:
                p = self.tokens[i]
                if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
                    self._byte_tokens[int(p[3:5], 16)] = i
        if self.model == "gpt2":
            self._merge_rank = {
                tuple(m.split(" ", 1)): r for r, m in enumerate(self.merges)
            }
            self._pre = PreTokenizer(self.pre)
            if not self._pre.known and self.pre not in ("", "default"):
                import logging

                logging.getLogger("tpu_engine.tokenizer").warning(
                    "unknown tokenizer.ggml.pre %r: using the gpt2 default "
                    "split regex (tokenization may differ from llama.cpp)",
                    self.pre)
        self._eog_extra = {
            self._piece_to_id[p]
            for p in ("<|eot_id|>", "<|im_end|>", "<|end|>", "<end_of_turn>",
                      "<|endoftext|>", "<EOT>", "<|end_of_text|>")
            if p in self._piece_to_id and self._piece_to_id[p] in self._special_ids
        }

    # -- construction -------------------------------------------------------
    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "Tokenizer":
        model = md.get("tokenizer.ggml.model", "llama")
        tokens = list(md["tokenizer.ggml.tokens"])
        scores = md.get("tokenizer.ggml.scores")
        scores = np.asarray(scores, np.float32) if scores is not None else None
        tt = md.get("tokenizer.ggml.token_type")
        if tt is None:
            tt = np.full(len(tokens), TokenType.NORMAL, np.int32)
        else:
            tt = np.asarray(tt, np.int32)
        merges = [str(m) for m in md.get("tokenizer.ggml.merges", [])]

        def _id(key, default=-1):
            v = md.get(f"tokenizer.ggml.{key}")
            return int(v) if v is not None else default

        tok = cls(
            model=str(model),
            tokens=tokens,
            scores=scores,
            token_types=tt,
            merges=merges,
            pre=str(md.get("tokenizer.ggml.pre", "default")),
            bos_id=_id("bos_token_id"),
            eos_id=_id("eos_token_id"),
            eot_id=_id("eot_token_id"),
            eom_id=_id("eom_token_id"),
            unk_id=_id("unknown_token_id"),
            pad_id=_id("padding_token_id"),
            add_bos=bool(md.get("tokenizer.ggml.add_bos_token",
                                model in ("llama", "bert"))),
            add_eos=bool(md.get("tokenizer.ggml.add_eos_token",
                                model == "bert")),
            add_space_prefix=bool(md.get("tokenizer.ggml.add_space_prefix", model == "llama")),
            fim_pre_id=_id("prefix_token_id"),
            fim_suf_id=_id("suffix_token_id"),
            fim_mid_id=_id("middle_token_id"),
        )
        if model == "bert":
            # WordPiece wraps with [CLS] ... [SEP] (llama.cpp llm_tokenizer_wpm
            # uses the cls/sep special ids through the add_bos/add_eos path)
            cls_id = _id("cls_token_id")
            sep_id = _id("seperator_token_id")  # llama.cpp's key spelling
            if tok.bos_id < 0:
                tok.bos_id = cls_id if cls_id >= 0 else tok._piece_to_id.get("[CLS]", -1)
            if tok.eos_id < 0:
                tok.eos_id = sep_id if sep_id >= 0 else tok._piece_to_id.get("[SEP]", -1)
            if tok.unk_id < 0:
                tok.unk_id = tok._piece_to_id.get("[UNK]", -1)
        if tok.fim_pre_id < 0:
            for name in ("<fim_prefix>", "<|fim_prefix|>", "<fim-prefix>", "<PRE>"):
                if name in tok._piece_to_id:
                    tok.fim_pre_id = tok._piece_to_id[name]
                    break
        if tok.fim_suf_id < 0:
            for name in ("<fim_suffix>", "<|fim_suffix|>", "<fim-suffix>", "<SUF>"):
                if name in tok._piece_to_id:
                    tok.fim_suf_id = tok._piece_to_id[name]
                    break
        if tok.fim_mid_id < 0:
            for name in ("<fim_middle>", "<|fim_middle|>", "<fim-middle>", "<MID>"):
                if name in tok._piece_to_id:
                    tok.fim_mid_id = tok._piece_to_id[name]
                    break
        return tok

    # -- properties ---------------------------------------------------------
    @property
    def n_tokens(self) -> int:
        return len(self.tokens)

    def is_eog(self, token_id: int) -> bool:
        """End-of-generation: eos/eot/eom or a known end-marker control token
        (reference: llama_vocab_is_eog, used at llama_server_context.cc:792)."""
        return token_id in (self.eos_id, self.eot_id, self.eom_id) and token_id >= 0 or (
            token_id in self._eog_extra
        )

    def is_control(self, token_id: int) -> bool:
        return self.token_types[token_id] == TokenType.CONTROL

    # -- encoding -----------------------------------------------------------
    def encode(
        self, text: str, add_special: bool = True, parse_special: bool = True
    ) -> list[int]:
        ids: list[int] = []
        if parse_special and self._special_pieces:
            for frag, special_id in self._split_specials(text):
                if special_id is not None:
                    ids.append(special_id)
                else:
                    ids.extend(self._encode_fragment(frag))
        else:
            ids.extend(self._encode_fragment(text))
        if add_special and self.add_bos and self.bos_id >= 0:
            if not ids or ids[0] != self.bos_id:
                ids.insert(0, self.bos_id)
        if add_special and self.add_eos and self.eos_id >= 0:
            ids.append(self.eos_id)
        return ids

    def _split_specials(self, text: str):
        """Partition text on special-token literals (longest match wins)."""
        out = []
        i = 0
        n = len(text)
        buf = []
        while i < n:
            matched = None
            for piece, tid in self._special_pieces:
                if text.startswith(piece, i):
                    matched = (piece, tid)
                    break
            if matched:
                if buf:
                    out.append(("".join(buf), None))
                    buf = []
                out.append((matched[0], matched[1]))
                i += len(matched[0])
            else:
                buf.append(text[i])
                i += 1
        if buf:
            out.append(("".join(buf), None))
        return out

    def _encode_fragment(self, text: str) -> list[int]:
        if not text:
            return []
        if self.model == "gpt2":
            return self._encode_bpe(text)
        if self.model == "bert":
            return self._encode_wpm(text)
        return self._encode_spm(text)

    # WordPiece (bert-family embedding models) ------------------------------
    def _encode_wpm(self, text: str) -> list[int]:
        """WordPiece with BERT basic normalization (llm_tokenizer_wpm
        semantics): lowercase + strip combining accents, split on
        whitespace / punctuation / CJK, then greedy longest-match with the
        "##" continuation prefix; an unmatchable word becomes [UNK]."""
        import unicodedata

        words: list[str] = []
        cur: list[str] = []

        def flush():
            if cur:
                words.append("".join(cur))
                cur.clear()

        for ch in unicodedata.normalize("NFD", text.lower()):
            cat = unicodedata.category(ch)
            if cat == "Mn":  # combining accents stripped
                continue
            cp = ord(ch)
            if ch.isspace() or cat in ("Cc", "Cf"):
                flush()
            elif cat.startswith("P") or (
                33 <= cp <= 47 or 58 <= cp <= 64
                or 91 <= cp <= 96 or 123 <= cp <= 126
            ) or (
                0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
                or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2A6DF
            ):
                flush()
                words.append(ch)
            else:
                cur.append(ch)
        flush()

        ids: list[int] = []
        for word in words:
            i, n = 0, len(word)
            word_ids: list[int] = []
            while i < n:
                j = n
                tid = None
                while j > i:
                    piece = ("##" if i else "") + word[i:j]
                    tid = self._piece_to_id.get(piece)
                    if tid is not None:
                        break
                    j -= 1
                if tid is None:
                    word_ids = [self.unk_id] if self.unk_id >= 0 else []
                    break
                word_ids.append(tid)
                i = j
            ids.extend(word_ids)
        return ids

    # SentencePiece-style greedy score merges -------------------------------
    def _encode_spm(self, text: str) -> list[int]:
        """Highest-score bigram merging with a lazy-invalidation heap
        (the llm_tokenizer_spm pattern): O(L log L) instead of rescanning
        every adjacent pair per merge — a multi-KB prompt must not stall
        the engine thread."""
        if self.add_space_prefix and text and not text.startswith(" "):
            text = " " + text
        text = text.replace(" ", SPIECE_UNDERLINE)
        if not text:
            return []
        scores = self.scores

        # doubly-linked symbol list: (piece, prev, next); -1 terminates
        syms: list[list] = [[ch, i - 1, i + 1] for i, ch in enumerate(text)]
        syms[-1][2] = -1
        heap: list[tuple[float, int, int, str]] = []  # (-score, left, right, merged)

        def try_pair(li: int, ri: int) -> None:
            if li < 0 or ri < 0:
                return
            cand = syms[li][0] + syms[ri][0]
            tid = self._piece_to_id.get(cand)
            if tid is None or tid in self._special_ids:
                return
            s = float(scores[tid]) if scores is not None else -len(cand)
            heapq.heappush(heap, (-s, li, ri, cand))

        for i in range(len(syms) - 1):
            try_pair(i, i + 1)

        while heap:
            _, li, ri, cand = heapq.heappop(heap)
            # lazy invalidation: either side may have been merged away
            if syms[li][0] is None or syms[ri][0] is None:
                continue
            if syms[li][0] + syms[ri][0] != cand or syms[li][2] != ri:
                continue
            syms[li][0] = cand
            syms[ri][0] = None  # right side absorbed
            syms[li][2] = syms[ri][2]
            if syms[ri][2] >= 0:
                syms[syms[ri][2]][1] = li
            try_pair(syms[li][1], li)
            try_pair(li, syms[li][2])

        ids: list[int] = []
        i = 0
        while i >= 0:
            sym = syms[i][0]
            i = syms[i][2]
            if sym is None:
                continue
            tid = self._piece_to_id.get(sym)
            if tid is not None and tid not in self._special_ids:
                ids.append(tid)
            else:
                # byte fallback
                bs = sym.encode("utf-8")
                ok = all(b in self._byte_tokens for b in bs)
                if ok:
                    ids.extend(self._byte_tokens[b] for b in bs)
                elif self.unk_id >= 0:
                    ids.append(self.unk_id)
        return ids

    # GPT-2 byte-level BPE --------------------------------------------------
    def _encode_bpe(self, text: str) -> list[int]:
        ids: list[int] = []
        for piece in self._pre.split(text):
            mapped = "".join(_BYTE_TO_UNI[b] for b in piece.encode("utf-8"))
            if self._pre.ignore_merges:
                # llama3-family: a word already in the vocab is emitted
                # whole without running merges
                tid = self._piece_to_id.get(mapped)
                if tid is not None:
                    ids.append(tid)
                    continue
            for word in self._bpe_merge(mapped):
                tid = self._piece_to_id.get(word)
                if tid is not None:
                    ids.append(tid)
                elif self.unk_id >= 0:
                    ids.append(self.unk_id)
        return ids

    def _bpe_merge(self, word: str) -> list[str]:
        parts = list(word)
        if len(parts) < 2:
            return parts
        ranks = self._merge_rank
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                return parts
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]

    # -- decoding -----------------------------------------------------------
    def piece_bytes(self, token_id: int, special: bool = False) -> bytes:
        """Raw bytes of one token (reference: common_token_to_piece)."""
        tt = self.token_types[token_id]
        piece = self.tokens[token_id]
        if tt == TokenType.BYTE:
            if piece.startswith("<0x"):
                return bytes([int(piece[3:5], 16)])
            return piece.encode("utf-8")
        if tt == TokenType.CONTROL and not special:
            return b""
        if self.model == "gpt2":
            if token_id in self._special_ids:
                return piece.encode("utf-8")
            try:
                return bytes(_UNI_TO_BYTE[c] for c in piece)
            except KeyError:
                return piece.encode("utf-8")
        return piece.replace(SPIECE_UNDERLINE, " ").encode("utf-8")

    def decode(self, ids, special: bool = False) -> str:
        bs = b"".join(self.piece_bytes(int(i), special=special) for i in ids)
        text = bs.decode("utf-8", errors="replace")
        if self.model == "llama" and self.add_space_prefix and text.startswith(" "):
            # strip the synthetic space if the first content token begins with ▁
            first = next(
                (int(i) for i in ids if self.piece_bytes(int(i), special=special)), None
            )
            if first is not None and self.tokens[first].startswith(SPIECE_UNDERLINE):
                text = text[1:]
        return text


class StreamDetokenizer:
    """Incremental detokenizer with UTF-8 hold-back.

    Mirrors the reference's incomplete-multibyte handling in ProcessToken
    (/root/reference/src/llama_server_context.cc:727-747): text is only
    released once it ends on a UTF-8 boundary.
    """

    def __init__(self, tok: Tokenizer):
        self.tok = tok
        self._pending = b""
        self._first = True

    def push(self, token_id: int) -> str:
        self._pending += self.tok.piece_bytes(token_id)
        # Release the longest prefix that ends on a UTF-8 boundary: walk back
        # over trailing continuation bytes to the last lead byte and check
        # whether that character is complete.
        p = self._pending
        i = len(p)
        k = 0
        while i > 0 and k < 3 and (p[i - 1] & 0xC0) == 0x80:
            i -= 1
            k += 1
        cut = len(p)
        if i > 0 and (p[i - 1] & 0x80) != 0 and (p[i - 1] & 0xC0) != 0x80:
            lead = p[i - 1]
            need = 2 if lead & 0xE0 == 0xC0 else 3 if lead & 0xF0 == 0xE0 else 4
            if len(p) - (i - 1) < need:
                cut = i - 1  # incomplete character: hold back from its lead
        out, self._pending = self._pending[:cut], self._pending[cut:]
        text = out.decode("utf-8", errors="replace")
        if self._first and text:
            if self.tok.model == "llama" and self.tok.add_space_prefix and text.startswith(" "):
                text = text[1:]
            self._first = False
        return text

    def flush(self) -> str:
        out, self._pending = self._pending, b""
        return out.decode("utf-8", errors="replace")
