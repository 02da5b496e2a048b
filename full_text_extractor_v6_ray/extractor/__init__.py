"""Pure extraction library — no Ray imports anywhere in this subpackage.

Byte-identical determinism is won or lost here (SURVEY.md §7.4): every
function is pure, iteration order is explicit, no set-order dependence,
no wall-clock, no randomness.
"""

from .links import fix_url
from .normalize import normalize_text, normalize_ws
from .sniff import register_sniffer, sniff_payload, unregister_sniffer
from .document import (
    ExtractResult,
    extract_document,
    register_extractor,
    unregister_extractor,
)

__all__ = [
    "fix_url",
    "normalize_text",
    "normalize_ws",
    "sniff_payload",
    "extract_document",
    "ExtractResult",
]
