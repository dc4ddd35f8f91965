from .tokenizer import StreamDetokenizer, Tokenizer, TokenType

__all__ = ["Tokenizer", "TokenType", "StreamDetokenizer"]
