"""Error hierarchy mirroring the reference's error surface.

Reference: /root/reference/lib/tantiny/errors.rb (TantinyError subclasses:
UnexpectedNone, UnsupportedRange, UnsupportedField, UnknownField,
UnknownTokenizer, IndexWriterBusyError).
"""

from __future__ import annotations


class TantinyError(Exception):
    """Base class for all engine errors."""


class UnexpectedNone(TantinyError):
    """A value that must be present was None (errors.rb:15-19)."""


class UnsupportedRange(TantinyError):
    """Range element type is not int/float/date (errors.rb:21-31)."""

    def __init__(self, type_name: str):
        super().__init__(
            f"Range of type {type_name} is not supported; use int, float or datetime."
        )


class UnsupportedField(TantinyError):
    """Query targets a field whose kind does not support it (errors.rb:33-37)."""

    def __init__(self, field: str):
        super().__init__(f"Field '{field}' is not supported for this query type.")


class UnknownField(TantinyError):
    """Document/query references a field absent from the schema (errors.rb:39-43)."""

    def __init__(self, field: str = ""):
        super().__init__(f"Field '{field}' is not present in the schema.")


class UnknownTokenizer(TantinyError):
    """Tokenizer kind not one of simple/stemmer/ngram (errors.rb:45-49)."""

    def __init__(self, kind: str):
        super().__init__(f"Tokenizer kind '{kind}' is unknown.")


class IndexWriterBusyError(TantinyError):
    """Another writer holds the index lock (errors.rb:6-13)."""


class UnsupportedRegexSyntax(TantinyError):
    """The pattern uses a Java-regex extension that Rust's regex crate (the
    reference's engine, src/query.rs:101-117) rejects: backreferences,
    lookaround, possessive quantifiers, or conditionals. The reference would
    raise on these patterns, so accepting them here would silently diverge —
    the supported dialect is the common Rust∩Java subset."""


class QueryParseError(TantinyError):
    """parse_query could not parse the query string (bad syntax, unknown
    field, or an atom unsupported for the target field kind)."""
