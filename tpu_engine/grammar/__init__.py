"""GBNF grammar-constrained decoding (SURVEY.md section 2b "Grammar").

build_matcher(grammar_text, tokenizer) -> matcher with:
    allowed_mask() -> bool[n_vocab] | None
    accept(token_id)
    reset()
    done() -> bool
"""

from .gbnf import GrammarMatcher, build_matcher, parse_gbnf
from .json_schema import json_schema_to_grammar

__all__ = ["build_matcher", "GrammarMatcher", "parse_gbnf", "json_schema_to_grammar"]
