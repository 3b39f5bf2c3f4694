"""Pure-Python Arc90 readability engine (single-document core).

This package is the per-document kernel that the Spark layer wraps in
vectorized Arrow UDFs. It has no Spark dependency and is unit-testable in
isolation (SURVEY.md §7 Phase 1).
"""

from .transcoder import Transcoder, TranscodeResult, transcode  # noqa: F401
from .parser import build_document  # noqa: F401
from .transcoder import serialize_document  # noqa: F401
