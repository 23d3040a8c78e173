"""Conformance fixtures.

The decomposed-regex JSON configs below are the reference's test fixtures
(reference: test_regexes/regex{1,2,3}_test.json and the inline config of
examples/regex.rs:151-178). The compiled allstr/substr text tables must be
byte-identical to the reference's committed lookup files; their sha256
digests are pinned here so conformance holds even when the reference mount
is absent. When /root/reference is present the tests additionally diff the
full file contents.
"""

from __future__ import annotations

import hashlib
import os

REFERENCE_DIR = os.environ.get("HALO2_REGEX_REFERENCE", "/root/reference")

# The 98-byte catch-all alternation used by the fixtures (see the reference
# fixture JSONs; note `\x0b|\x0c` parses as literal 3-char sequences under the
# toy grammar — SURVEY §8.1).
CATCH_ALL_FIXTURE = (
    "(0|1|2|3|4|5|6|7|8|9|a|b|c|d|e|f|g|h|i|j|k|l|m|n|o|p|q|r|s|t|u|v|w|x|y|z"
    "|A|B|C|D|E|F|G|H|I|J|K|L|M|N|O|P|Q|R|S|T|U|V|W|X|Y|Z"
    "|!|\"|#|$|%|&|'|\\(|\\)|\\*|\\+|,|-|.|/|:|;|<|=|>|\\?|@|[|\\\\|]|^|_|`"
    "|{|\\||}|~| |\t|\n|\r|\\x0b|\\x0c)"
)

LOWER_ALT = "(a|b|c|d|e|f|g|h|i|j|k|l|m|n|o|p|q|r|s|t|u|v|w|x|y|z)"

ALNUM_ALT = (
    "(a|b|c|d|e|f|g|h|i|j|k|l|m|n|o|p|q|r|s|t|u|v|w|x|y|z"
    "|A|B|C|D|E|F|G|H|I|J|K|L|M|N|O|P|Q|R|S|T|U|V|W|X|Y|Z"
    "|0|1|2|3|4|5|6|7|8|9"
)

REGEX1_CONFIG = {
    "max_byte_size": 128,
    "parts": [
        {"is_public": False, "regex_def": f"({CATCH_ALL_FIXTURE}+)?", "max_size": 128},
        {"is_public": False, "regex_def": "email was meant for @", "max_size": 21},
        {
            "is_public": True,
            "regex_def": f"{LOWER_ALT}+",
            "max_size": 4,
            "solidity": {"type": "String"},
        },
        {"is_public": False, "regex_def": ".", "max_size": 1},
        {"is_public": False, "regex_def": f"({CATCH_ALL_FIXTURE}+)?", "max_size": 128},
    ],
}

REGEX2_CONFIG = {
    "max_byte_size": 128,
    "parts": [
        {"is_public": False, "regex_def": f"({CATCH_ALL_FIXTURE}+)?", "max_size": 128},
        {"is_public": False, "regex_def": " Also for ", "max_size": 21},
        {
            "is_public": True,
            "regex_def": f"{LOWER_ALT}+",
            "max_size": 20,
            "solidity": {"type": "String"},
        },
        {"is_public": False, "regex_def": ".", "max_size": 1},
        {"is_public": False, "regex_def": f"({CATCH_ALL_FIXTURE}+)?", "max_size": 128},
    ],
}

# regex3: the email `from:` header address extraction.
_NAME_ALT = ALNUM_ALT + '|_|\\.|"| |@)'
_EMAIL_ALT = ALNUM_ALT + "|_|\\.|-)"

REGEX3_CONFIG = {
    "max_byte_size": 128,
    "parts": [
        {
            "is_public": False,
            "regex_def": f"({CATCH_ALL_FIXTURE}+\r\n)?",
            "max_size": 128,
        },
        {"is_public": False, "regex_def": "from:", "max_size": 7},
        {"is_public": False, "regex_def": f"({_NAME_ALT}+<)?", "max_size": 20},
        {
            "is_public": True,
            "regex_def": f"{_EMAIL_ALT}+@{_EMAIL_ALT}+",
            "max_size": 20,
            "solidity": {"type": "String"},
        },
        {"is_public": False, "regex_def": ">?\r\n", "max_size": 3},
    ],
}

EXAMPLE_CONFIG = {
    "max_byte_size": 128,
    "parts": [
        {"is_public": False, "regex_def": "email was meant for @", "max_size": 21},
        {
            "is_public": True,
            "regex_def": f"{LOWER_ALT}+",
            "max_size": 7,
            "solidity": {"type": "String"},
        },
        {"is_public": False, "regex_def": ".", "max_size": 1},
    ],
}

# sha256 of the reference's committed lookup text files — the byte-exact
# conformance targets.
EXPECTED_SHA256 = {
    "regex1_allstr": "3b8fbd805cdd9e9d6d92d618925fa8c4de0bcb47ecea160477a816acce8557d9",
    "regex2_allstr": "76b5300d52e3b4ead36b6e3378a2767bdc91cb14975b67042895ffa646f33694",
    "regex3_allstr": "15723b256737ede43aa9f203b0f813b153995d8d5f09af3c6a6654325b8f6a93",
    "substr1": "36c58c5d3166909c5406a2040d909c670c99b3d03f17ab936493f5596907d2a1",
    "substr2": "877143cf575f22e79378e9909025b4ad6acde5a3c5d068b3047931a715099572",
    "substr3": "2c9a3968e281d56ff24cb9f8b4b51feb747a5b57936cd73efef348461deb7d60",
    "ex_allstr": "57d0e34bf4534a1d4301ea896c32212abea6e22fa85f9927b1703412fc618f69",
}

CONFIGS = {
    "regex1": REGEX1_CONFIG,
    "regex2": REGEX2_CONFIG,
    "regex3": REGEX3_CONFIG,
}


def sha256_text(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def reference_file(relpath: str) -> str | None:
    """Contents of a reference file if the read-only mount is present."""
    path = os.path.join(REFERENCE_DIR, relpath)
    if os.path.exists(path):
        with open(path) as f:
            return f.read()
    return None
