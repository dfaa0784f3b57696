"""Transcript known-answer tests (merlin 3.0.0 / STROBE-128 fidelity)."""

import hashlib

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk.transcript import Strobe128, Transcript, keccak_f1600


def test_keccak_f1600_via_sha3():
    """Cross-check the permutation through hashlib's SHA3-256.

    SHA3-256("") is absorb of padding 0x06...0x80 into a zero state followed
    by one keccak-f; reproduce that by hand.
    """
    st = bytearray(200)
    rate = 136
    st[0] ^= 0x06
    st[rate - 1] ^= 0x80
    keccak_f1600(st)
    assert bytes(st[:32]) == hashlib.sha3_256(b"").digest()


def test_merlin_equivalence_kat():
    """merlin 3.0.0's own transcript test vector (merlin/src/transcript.rs
    test_transcript_kat): proves the whole STROBE stack byte-for-byte."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert challenge.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_multi_round_regression():
    """32 rounds of 1KiB messages + challenges: exercises the STROBE rate
    boundary (R=166) and run_f framing, which the single-round KAT does not.

    The pinned value is a self-generated regression vector (the permutation is
    independently verified through SHA3, and the single-round framing through
    merlin's published KAT above)."""
    t = Transcript(b"test protocol")
    t.append_message(b"step1", b"some data")
    data = bytes([99] * 1024)
    chl = b""
    for _ in range(32):
        chl = t.challenge_bytes(b"challenge", 32)
        t.append_message(b"bigdata", data)
        t.append_message(b"challengedata", chl)
    assert chl.hex() == (
        "a8c933f54fae76e3f9bea93648c1308e7dfa2152dd51674ff3ca438351cf003c"
    )


def test_clone_is_independent():
    t = Transcript(b"proto")
    t.append_message(b"a", b"b")
    c = t.clone()
    x = t.challenge_bytes(b"c", 32)
    y = c.challenge_bytes(b"c", 32)
    assert x == y
    t.append_message(b"d", b"e")
    assert c.challenge_bytes(b"f", 8) != t.challenge_bytes(b"f", 8)


def test_challenge_scalar_wide_reduction():
    t = Transcript(b"proto")
    t.append_scalar(b"s", Fr(12345))
    t2 = Transcript(b"proto")
    t2.append_message(b"s", Fr(12345).to_bytes())
    raw = t2.challenge_bytes(b"c", 64)
    expected = Fr(int.from_bytes(raw, "little"))
    assert t.challenge_scalar(b"c") == expected


def test_strobe_streaming_chunks_match():
    """meta_ad/ad continuation flags: many small absorbs == one big absorb
    (mirrors merlin's test_equivalence_simple discipline)."""
    s1 = Strobe128(b"the label")
    s2 = Strobe128(b"the label")
    data = bytes(range(256)) * 4
    s1.ad(data, False)
    s2.ad(data[:100], False)
    s2.ad(data[100:], True)
    assert s1.prf(32, False) == s2.prf(32, False)
