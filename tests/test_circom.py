"""Circom codegen parity tests (reference: src/vrm/circom.rs:74-111 smoke
test plus structural assertions on the emitted template)."""

import pytest

from halo2_regex_tpu.compiler.circom import gen_circom, gen_circom_allstr
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig

from fixtures import EXAMPLE_CONFIG


@pytest.fixture(scope="module")
def config():
    return DecomposedRegexConfig.from_json(EXAMPLE_CONFIG)


def test_circom1_smoke(tmp_path, config):
    """Mirror of the reference's circom1_test (same decomposed config)."""
    out = tmp_path / "test1_regex.circom"
    text = gen_circom(config, out, "Test1Regex")
    assert out.read_text() == text
    assert text.startswith("pragma circom 2.1.5;")
    assert "template Test1Regex(msg_bytes)" in text


def test_state_recurrence_structure(config):
    nodes = config.compile_dfa()
    text = gen_circom_allstr(nodes, "T")
    n = len(nodes)
    # one-hot state vector per byte, state 0 as not-state_changed
    assert f"signal states[num_bytes+1][{n}];" in text
    assert "states[i+1][0] <== 1 - state_changed[i].out;" in text
    # init: state 0 hot
    assert "states[0][0] <== 1;" in text
    # the ^(94)->128 init-char feed
    assert "in[0]<==128;" in text
    # acceptance via MultiOR over the accept column
    from halo2_regex_tpu.compiler.pipeline import get_accepted_state

    acc = get_accepted_state(nodes)
    assert f"final_state_result.in[i] <== states[i][{acc}];" in text


def test_range_compression(config):
    """The lowercase a-z alternation must compress into LessThan pairs, not
    26 IsEqual gates (circom.js:114-156)."""
    nodes = config.compile_dfa()
    text = gen_circom_allstr(nodes, "T")
    assert "LessThan(8)" in text
    # 96 < in < 123 is the lowercase range
    assert "in[0] <== 96;" in text
    assert "in[1] <== 123;" in text


def test_reveal_logic(config):
    text = gen_circom(config, None, "T")
    assert "is_consecutive[msg_bytes][1] <== 1;" in text
    assert "signal output reveal0[msg_bytes];" in text
    assert "reveal0[i] <== in[i+1] * is_reveal0[i];" in text


def test_multi_accept_rejected():
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 16,
            "parts": [{"is_public": False, "regex_def": "ab(c)?", "max_size": 3}],
        }
    )
    with pytest.raises(ValueError, match="accept"):
        gen_circom_allstr(cfg.compile_dfa(), "T")


# ---------------------------------------------------------------------------
# Semantic equivalence: execute the emitted circuit text and compare against
# an independent forward model of the DFA (VERDICT r1 item 5 — no node/deno
# in this environment to regenerate the reference's own output, and its
# HashSet reveal order is nondeterministic, so equivalence is checked by
# EVALUATION rather than byte-diff; our sorted emission order is pinned by
# the structural tests above).
# ---------------------------------------------------------------------------

import numpy as np

from halo2_regex_tpu.compiler.circom_sim import CircomSim
from halo2_regex_tpu.compiler.pipeline import (
    edge_key_chars,
    get_accepted_state,
    sorted_edge_items,
)
from fixtures import CONFIGS


def _forward_model(nodes, msg: bytes, msg_bytes: int):
    """Independent forward evaluation of the circom DFA semantics: one-hot
    states over [128] + msg, state 0 = not-any-other, with the ^(94)->128
    init-char rewiring (circom.js:20-24, 322) implemented forward (the
    emitter builds the reversed graph)."""
    N = len(nodes)
    base = []  # (src, dst, codes)
    init_going_state = None
    to_init = [[] for _ in range(N)]
    for i, node in enumerate(nodes):
        for key, v in sorted_edge_items(node.edges):
            codes = [ord(c) for c in edge_key_chars(key)]
            if i == 0:
                if 94 in codes:
                    init_going_state = v
                    codes = [128 if c == 94 else c for c in codes]
                for c in codes:
                    if c != 128:
                        to_init[v].append(c)
            base.append((i, v, set(codes)))
    if init_going_state is not None:
        for v, cs in enumerate(to_init):
            if cs:
                base.append((init_going_state, v, set(cs)))

    inp = [128] + list(msg) + [0] * (msg_bytes - len(msg))
    states = [[0] * N]
    states[0][0] = 1
    changed = []
    for c in inp:
        cur = states[-1]
        nxt = [0] * N
        for s, v, codes in base:
            if v != 0 and cur[s] and c in codes:
                nxt[v] = 1
        ch = 1 if any(nxt[1:]) else 0
        nxt[0] = 1 - ch
        changed.append(ch)
        states.append(nxt)
    return states, changed


CIRCOM_CASES = [
    ("regex3", b"from:alice@gmail.com\r\n"),
    ("regex3", b"dummy\r\nfrom:alice<alice@gmail.com>\r\n"),
    ("regex3", b"from:alice<alicegmail.com>\r\n"),
    ("regex3", b""),
    ("regex1", b"email was meant for @yajk."),
    ("regex2", b". Also for swq."),
]


@pytest.mark.parametrize("name,msg", CIRCOM_CASES)
def test_circom_semantic_equivalence(name, msg):
    cfg = DecomposedRegexConfig.from_json(CONFIGS[name])
    nodes = cfg.compile_dfa()
    text = gen_circom(cfg, None, "T")
    msg_bytes = 48
    sim = CircomSim(text, msg, msg_bytes)
    states, changed = _forward_model(nodes, msg, msg_bytes)
    assert sim.states == states, "one-hot state evolution diverged"
    assert sim.state_changed == changed
    acc = get_accepted_state(nodes)
    assert sim.out == (1 if any(s[acc] for s in states) else 0)


def test_circom_reveal_semantics():
    """The reveal output must light exactly the substring the DFA tags
    (evaluated, vs the pair sets + is_consecutive recurrence computed
    directly from the simulated states)."""
    cfg = DecomposedRegexConfig.from_json(CONFIGS["regex3"])
    nodes = cfg.compile_dfa()
    text = gen_circom(cfg, None, "T")
    msg = b"from:alice@gmail.com\r\n"
    msg_bytes = 48
    sim = CircomSim(text, msg, msg_bytes)
    substr_defs_array, _, _ = cfg.extract_substr_ids(nodes)
    pairs = substr_defs_array[0]
    mb = msg_bytes
    cons = [[0, 0] for _ in range(mb + 1)]
    cons[mb][1] = 1
    acc = get_accepted_state(nodes)
    for i in range(mb):
        j = mb - 1 - i
        cons[j][0] = sim.states[mb + 1 - i][acc] * (1 - cons[j + 1][1]) + cons[j + 1][1]
        cons[j][1] = sim.state_changed[mb - i] * cons[j][0]
    expect = [
        sim.inp[i + 1]
        * sum(
            sim.states[i + 1][a] * sim.states[i + 2][b] for (a, b) in pairs
        )
        * cons[i][1]
        for i in range(mb)
    ]
    assert sim.reveals[0] == expect
    revealed = bytes(v for v in sim.reveals[0] if v)
    assert revealed == b"alice@gmail.com"


# ---------------------------------------------------------------------------
# Round 3: pinned emission golden + differential coverage beyond the three
# fixtures (all zoo models and fuzzed toy-grammar configs).
# ---------------------------------------------------------------------------

from pathlib import Path

from halo2_regex_tpu.models import zoo

GOLDEN_CIRCOM = Path(__file__).parent / "golden" / "test1_regex.circom"


def test_emission_golden_pinned(config):
    """Byte-pinned emission for the reference's circom1_test config.

    NOTE: this golden is SELF-generated (no node/deno in this environment
    to run the reference's circom.js; the reference repo commits no
    .circom output and its reveal-pair iteration order is a Rust HashSet —
    nondeterministic). It pins OUR deterministic emission against drift;
    cross-implementation equivalence is established semantically by the
    CircomSim differential tests below and above.
    """
    assert gen_circom(config, None, "Test1Regex") == GOLDEN_CIRCOM.read_text()


def _assert_sim_equivalent(cfg, msg: bytes, msg_bytes: int = 48):
    nodes = cfg.compile_dfa()
    text = gen_circom(cfg, None, "T")
    sim = CircomSim(text, msg, msg_bytes)
    states, changed = _forward_model(nodes, msg, msg_bytes)
    assert sim.states == states, "one-hot state evolution diverged"
    assert sim.state_changed == changed
    acc = get_accepted_state(nodes)
    assert sim.out == (1 if any(s[acc] for s in states) else 0)
    return sim, nodes


ZOO_CASES = [
    ("email_from", b"x\r\nfrom:bob@example.org\r\n", b"x\r\nfrom:bobexample\r\n"),
    ("email_to", b"to:carol@dest.io\r\n", b"to carol@dest.io\r\n"),
    (
        "email_subject",
        b"subject:Hello there\r\n",
        b"subject Hello there\r\n",
    ),
]


@pytest.mark.parametrize("name,pos,neg", ZOO_CASES)
def test_circom_zoo_differential(name, pos, neg):
    """Every zoo header model's emitted circom executes equivalently to the
    independent forward DFA model, accepts its positive input, rejects its
    negative, and reveals exactly the public part."""
    cfg = zoo.get_config(name, max_byte_size=48)
    sim_pos, nodes = _assert_sim_equivalent(cfg, pos)
    assert sim_pos.out == 1
    sim_neg, _ = _assert_sim_equivalent(cfg, neg)
    assert sim_neg.out == 0


def test_circom_body_prefix_differential():
    cfg = zoo.get_config("body_prefix", max_byte_size=64)
    body = b'Content-Type: text/plain; charset="UTF-8"\r\n\r\n'
    sim, _ = _assert_sim_equivalent(cfg, b"x" + body, msg_bytes=64)
    assert sim.out == 1
    sim_neg, _ = _assert_sim_equivalent(cfg, body[:-2], msg_bytes=64)
    assert sim_neg.out == 0


def test_circom_fuzz_differential():
    """Fuzzed toy-grammar configs: the emitted circom's state evolution
    matches the forward model on random inputs (multi-accept DFAs are
    rejected by the emitter and skipped, matching circom.js:62-67)."""
    from test_compiler_fuzz import ALPHA, gen_pattern

    rng = np.random.default_rng(7)
    checked = 0
    while checked < 12:
        pat, _py = gen_pattern(rng)
        cfg = DecomposedRegexConfig.from_json(
            {
                "max_byte_size": 24,
                "parts": [
                    {"is_public": False, "regex_def": pat, "max_size": 24}
                ],
            }
        )
        try:
            nodes = cfg.compile_dfa()
            text = gen_circom(cfg, None, "T")
        except (ValueError, RecursionError):
            continue  # multi-accept or degenerate pattern
        for _ in range(3):
            n = int(rng.integers(0, 12))
            msg = "".join(
                ALPHA[rng.integers(0, len(ALPHA))] for _ in range(n)
            ).encode()
            sim = CircomSim(text, msg, 24)
            states, changed = _forward_model(nodes, msg, 24)
            assert sim.states == states, (pat, msg)
            assert sim.state_changed == changed, (pat, msg)
        checked += 1
    assert checked == 12


# ---------------------------------------------------------------------------
# Adversarial differentials (round 4, VERDICT r3 #8): patterns and inputs
# chosen to hit the emitter's edge machinery — the ^(94)->128 init-char
# rewiring (circom.js:20-24, 322), the six LessThan range boundaries
# (circom.js:78-156), IsEqual leftovers just outside a compressed range,
# input bytes that alias the init sentinel, and padding boundaries.
# ---------------------------------------------------------------------------

ADVERSARIAL_CASES = [
    # '^' as a LITERAL initial char: triggers the init-hack rewiring on a
    # state-0 edge, plus a message that actually contains byte 94
    ("(^|a)b", [b"^b", b"ab", b"b^", b"^^b", b""]),
    # '^' mid-pattern (NOT on a state-0 edge: no rewiring)
    ("a(^|b)c", [b"a^c", b"abc", b"^ac", b"a^"]),
    # full digit range: compresses to one LessThan pair; probe both
    # boundaries (47 '/', 58 ':') which must NOT match
    ("(0|1|2|3|4|5|6|7|8|9)+", [b"0129", b"/12", b"19:", b"5", b""]),
    # range minus one char (no '5'): leftover IsEqual path vs LessThan
    ("(0|1|2|3|4|6|7|8|9)+", [b"0468", b"45", b"5", b"9"]),
    # two ranges + symbols spanning boundary chars 64 '@' / 91 '[' / 96 '`'
    ("(@|A|Z|a|z|`)+", [b"@Az", b"`", b"[", b"AZ", b"az`@"]),
    # self-loop heavy with escapes: CRLF handling
    ("(a)*\r\n", [b"\r\n", b"aaaa\r\n", b"a\ra\n", b"aa\r", b"aaan"]),
    # alternation where one branch is a prefix of the other
    ("(ab|abc)d", [b"abd", b"abcd", b"abcc", b"ad"]),
]


@pytest.mark.parametrize("pat,msgs", ADVERSARIAL_CASES)
def test_circom_adversarial_differential(pat, msgs):
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 16,
            "parts": [{"is_public": False, "regex_def": pat, "max_size": 16}],
        }
    )
    for msg in msgs:
        _assert_sim_equivalent(cfg, msg, msg_bytes=16)
    # padding boundary: a message that fills msg_bytes exactly
    full = msgs[0] + b"x" * (16 - len(msgs[0]))
    _assert_sim_equivalent(cfg, full, msg_bytes=16)


def test_circom_init_sentinel_aliasing():
    """A message byte equal to 128 aliases the init sentinel: both the
    emitted circuit and the forward model must treat it as taking the
    state-0 '^' transitions (reference circom.js rewires 94->128
    unconditionally, so a raw 0x80 input byte hits the same comparators).
    The differential pins that our emitter matches the reference's
    semantics here rather than silently diverging."""
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 16,
            "parts": [
                {"is_public": False, "regex_def": "(^|a)b", "max_size": 16}
            ],
        }
    )
    _assert_sim_equivalent(cfg, b"\x80b", msg_bytes=16)
    _assert_sim_equivalent(cfg, b"a\x80b", msg_bytes=16)


def test_circom_fuzz_differential_wide_alphabet():
    """Fuzz with an alphabet that crosses every compressed-range boundary
    byte (47/58, 57/65, 64/91, 90/97, 96/123, 122/127) plus control chars,
    so range-compression decisions are exercised randomly."""
    from test_compiler_fuzz import gen_pattern

    wide = list("/0:9;A@Z[a`z{~ \t") + ["^"]
    rng = np.random.default_rng(11)
    checked = 0
    attempts = 0
    while checked < 10 and attempts < 200:
        attempts += 1
        pat, _py = gen_pattern(rng)
        # splice wide-alphabet chars into the pattern's literals
        pat = "".join(
            (wide[rng.integers(0, len(wide))] if c in "abc d.:@-" else c)
            for c in pat
        )
        cfg = DecomposedRegexConfig.from_json(
            {
                "max_byte_size": 20,
                "parts": [
                    {"is_public": False, "regex_def": pat, "max_size": 20}
                ],
            }
        )
        try:
            cfg.compile_dfa()
            text = gen_circom(cfg, None, "T")
            del text
        except (ValueError, RecursionError):
            continue  # multi-accept or degenerate pattern
        for _ in range(3):
            n = int(rng.integers(0, 14))
            msg = bytes(
                ord(wide[rng.integers(0, len(wide))][0]) for _ in range(n)
            )
            _assert_sim_equivalent(cfg, msg, msg_bytes=20)
        checked += 1
    assert checked == 10
