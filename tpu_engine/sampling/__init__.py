from .chain import Sampler, SamplingParams, TokenProb

__all__ = ["Sampler", "SamplingParams", "TokenProb"]
