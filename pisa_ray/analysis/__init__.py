from pisa_ray.analysis.html import html_to_text, strip_http_headers
from pisa_ray.analysis.tokenizers import (
    english_tokenize,
    whitespace_tokenize,
    TOKENIZERS,
)
from pisa_ray.analysis.analyzer import TextAnalyzer, AnalyzerConfig

__all__ = [
    "html_to_text",
    "strip_http_headers",
    "english_tokenize",
    "whitespace_tokenize",
    "TOKENIZERS",
    "TextAnalyzer",
    "AnalyzerConfig",
]
