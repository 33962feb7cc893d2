"""Error taxonomy for the extraction engine.

Reproduces the reference's error *message semantics* (bakame-php/html-table,
``src/ParserError.php``) so that golden fixtures that assert exact error text
pass unchanged.  Driver-side (pipeline-build-time) misconfiguration raises
:class:`ParserError`; per-document parse failures on the distributed hot path
are **never raised** — they are demoted to ``status='error'`` rows (a raising
UDF would kill the whole Spark stage; see SURVEY.md §2.1).
"""

from __future__ import annotations


class ParserError(Exception):
    """Configuration / parse error with reference-compatible messages.

    Message formats mirror /root/reference/src/ParserError.php:45-53 and the
    inline throws in /root/reference/src/Parser.php (lines 77, 101, 104, 118,
    371, 373).
    """

    def __init__(self, message: str, duplicate_column_names: list[str] | None = None):
        super().__init__(message)
        self.duplicate_column_names: list[str] = duplicate_column_names or []

    @classmethod
    def due_to_duplicate_header_column_names(cls, header: list[str]) -> "ParserError":
        # First-occurrence order, names appearing more than once
        # (reference: ParserError.php:45-53 — array_count_values keeps
        # first-occurrence key order).
        counts: dict[str, int] = {}
        for name in header:
            counts[name] = counts.get(name, 0) + 1
        dups = [name for name, n in counts.items() if n > 1]
        return cls(
            "The header record contains duplicate column names: `"
            + "`, `".join(dups)
            + "`.",
            duplicate_column_names=dups,
        )


# Canonical message constants (referenced by tests and the kernel).
MSG_TABLE_NOT_FOUND = "The HTML table could not be found in the submitted html."
MSG_NON_STRING_HEADER = "The header record contains non string colum names."  # sic — reference typo kept verbatim (Parser.php:118)
MSG_ID_WHITESPACE = "The id attribute's value must not contain whitespace (spaces, tabs etc.)"
MSG_NEGATIVE_POSITION = "the table offset must be a positive integer or the table id attribute value."
MSG_NEGATIVE_HEADER_OFFSET = "The table header row offset must be a positive integer or 0."


def msg_not_a_table(tag_name: str) -> str:
    """Parser.php:373 message."""
    return f"Expected a table element to be selected; received `{tag_name}` instead."


def msg_invalid_xpath(expression: str) -> str:
    """Parser.php:77 message."""
    return f"The xpath expression `{expression}` is invalid."
