"""Pre-tokenizer regex variants keyed by `tokenizer.ggml.pre`.

llama.cpp selects a per-model split-regex list from the GGUF `pre` field
(the reference consumes it through common_tokenize,
/root/reference/src/llama_server_context.cc:395-410); a GGUF converted for
llama3/qwen2/deepseek mis-tokenizes under the plain gpt2 regex. The regex
strings below are the public per-family pre-tokenization rules these
models ship in their tokenizer.json (split behavior, not code, is the
compatibility surface).

Split semantics: patterns apply IN ORDER; each pattern's matches become
final fragments and the unmatched gaps flow to the next pattern; anything
still unmatched at the end is a fragment of its own.
"""

from __future__ import annotations

import regex as _regex

# GPT-2 (the default byte-level BPE split)
GPT2 = [r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"]

LLAMA3 = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+"
]

QWEN2 = [
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+"
]

FALCON = [
    r"[\p{P}\$\+<=>\^~\|`]+",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
    r"[0-9][0-9][0-9]",
]

STARCODER = [
    r"\p{N}",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
]

DEEPSEEK_CODER = [
    r"[\r\n]",
    r"\s?\p{L}+",
    r"\s?\p{P}+",
    r"[一-龥ࠀ-一가-퟿]+",
    r"\p{N}",
]

DEEPSEEK_LLM = [
    r"[\r\n]",
    r"\s?[A-Za-zµÀ-ÖØ-öø-ƺƼ-ƿǄ-ʓʕ-ʯͰ-ͳͶͷͻ-ͽͿΆΈ-ΊΌΎ-ΡΣ-ϵϷ-ҁҊ-ԯԱ-ՖႠ-ჅᎠ-Ᏽᏸ-ᏽᲐ-ᲺᲽ-Ჿᴀ-ᴫᵫ-ᵷᵹ-ᶚḀ-ἕἘ-Ἕἠ-ὅὈ-Ὅὐ-ὗὙὛὝὟ-ώᾀ-ᾴᾶ-ᾼιῂ-ῄῆ-ῌῐ-ΐῖ-Ίῠ-Ῥῲ-ῴῶ-ῼℂℇℊ-ℓℕℙ-ℝℤΩℨK-ℭℯ-ℴℹℼ-ℿⅅ-ⅉⅎↃↄⰀ-ⱻⱾ-ⳤⳫ-ⳮⳲⳳꙀ-ꙭꚀ-ꚛꜢ-ꝯꝱ-ꞇꞋ-ꞎꭰ-ꮿﬀ-ﬆﬓ-ﬗＡ-Ｚａ-ｚ𐐀-𐑏𐒰-𐓓𐓘-𐓻𐲀-𐲲𐳀-𐳲𑢠-𑣟𞤀-𞥃]+",
    r"\s?[!-/:-~！-／：-～‘-‟　-。]+",
    r"\s+$",
    r"[一-龥ࠀ-一가-퟿]+",
    r"\p{N}+",
]

TEKKEN = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+"
    r"|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*"
    r"|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"
]

# pre name -> (patterns, ignore_merges). ignore_merges: a word already in
# the vocab is emitted whole without running BPE merges (llama3 family).
PRE_TABLE: dict[str, tuple[list[str], bool]] = {
    "default": (GPT2, False),
    "gpt-2": (GPT2, False),
    "mpt": (GPT2, False),
    "olmo": (GPT2, False),
    "jais": (GPT2, False),
    "llama3": (LLAMA3, True),
    "llama-v3": (LLAMA3, True),
    "llama-bpe": (LLAMA3, True),
    "dbrx": (LLAMA3, False),
    "smaug-bpe": (LLAMA3, False),
    "qwen2": (QWEN2, False),
    "stablelm2": (QWEN2, False),
    "deepseek-r1-qwen": (QWEN2, False),
    "falcon": (FALCON, False),
    "starcoder": (STARCODER, False),
    "refact": (STARCODER, False),
    "command-r": (STARCODER, False),
    "smollm": (STARCODER, False),
    "codeshell": (STARCODER, False),
    "exaone": (STARCODER, False),
    "deepseek-llm": (DEEPSEEK_LLM, False),
    "deepseek-coder": (DEEPSEEK_CODER, False),
    "tekken": (TEKKEN, False),
}


class PreTokenizer:
    """Sequential regex splitter over a pattern list."""

    def __init__(self, pre: str):
        patterns, self.ignore_merges = PRE_TABLE.get(pre, PRE_TABLE["default"])
        self.known = pre in PRE_TABLE
        self._res = [_regex.compile(p) for p in patterns]

    def split(self, text: str) -> list[str]:
        frags = [(text, False)]  # (fragment, final)
        for rx in self._res:
            nxt: list[tuple[str, bool]] = []
            for frag, final in frags:
                if final or not frag:
                    if frag:
                        nxt.append((frag, final))
                    continue
                pos = 0
                for m in rx.finditer(frag):
                    if m.start() > pos:
                        nxt.append((frag[pos : m.start()], False))
                    if m.group():
                        nxt.append((m.group(), True))
                    pos = m.end()
                if pos < len(frag):
                    nxt.append((frag[pos:], False))
            frags = nxt
        return [f for f, _ in frags if f]
