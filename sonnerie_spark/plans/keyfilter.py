"""Key-filter analysis: sonnerie wildcards -> Spark predicates + prune bounds.

The reference's wildcard language is SQL-LIKE with ``%`` only
(wildcard.rs:10-83): a pattern with no ``%`` is an exact match; the fixed
prefix before the first ``%`` is extracted for index pruning; a regex is
compiled only when the pattern has a suffix after the ``%``.

In Spark, ``col LIKE 'pre%'`` is rewritten by Catalyst to ``StartsWith``
and pushed to Parquet. For patterns with inner/suffix parts we still add
an explicit prefix *range* conjunct (``key >= prefix AND key < upper``)
so row-group min/max pruning applies even when the LIKE itself cannot be
pushed — the declarative analogue of the reference's prefix-bounded scan
termination (key_reader.rs:296-303).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KeyFilter:
    """Analyzed wildcard: exact key, or prefix bounds + optional LIKE."""

    pattern: str  # escaped for Spark LIKE ('_' and '\\' made literal)
    exact: str | None  # set when pattern has no '%'
    prefix: str  # fixed prefix before first '%' ('' = match all)
    needs_like: bool  # True when prefix alone is not sufficient


def to_like_pattern(pattern: str) -> str:
    """Sonnerie wildcard -> Spark LIKE pattern.

    The reference treats only ``%`` as special (wildcard.rs as_regex
    escapes everything else); Spark LIKE additionally treats ``_`` as a
    single-char wildcard and ``\\`` as the escape char, so both must be
    escaped or a pattern like ``user_1%`` silently over-matches.
    """
    return pattern.replace("\\", "\\\\").replace("_", "\\_")


def analyze_wildcard(pattern: str) -> KeyFilter:
    pct = pattern.find("%")
    if pct < 0:
        return KeyFilter(pattern, exact=pattern, prefix=pattern, needs_like=False)
    prefix = pattern[:pct]
    # 'pre%' is fully covered by the prefix; 'pre%suf' / 'p%q%' needs LIKE
    needs_like = pct != len(pattern) - 1
    return KeyFilter(to_like_pattern(pattern), exact=None, prefix=prefix, needs_like=needs_like)


def wildcard_regex(pattern: str):
    """Compile a sonnerie wildcard to a Python regex.

    Mirrors wildcard.rs as_regex: only ``%`` is special (-> ``.*``),
    every other character is literal."""
    import re

    return re.compile(
        "^" + ".*".join(re.escape(part) for part in pattern.split("%")) + "$",
        re.DOTALL,
    )


def prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix.

    Increments the last incrementable character (same trick every
    storage engine uses for prefix scans). Returns None when the prefix
    is empty or all chars are at the max code point (unbounded end).
    """
    if not prefix:
        return None
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            return "".join(chars[:i]) + chr(cp + 1)
    return None
