"""Encryption tests: ElGamal over Jubjub + Poseidon/SAFE encryption
(+ gadget equivalence)."""

import pytest

from zkvm_tpu.curves.jubjub import (ElgamalCipher, JubjubAffine,
                                    JubjubExtended, dhke)
from zkvm_tpu.fields import Fr, JubjubFr
from zkvm_tpu.hashes.encryption import (DecryptionError, decrypt,
                                        decrypt_gadget, encrypt,
                                        encrypt_gadget)
from zkvm_tpu.plonk import Composer


def test_elgamal_roundtrip():
    secret = JubjubFr(123456789)
    r = JubjubFr(987654321)
    gen = JubjubExtended.generator()
    public = gen * secret
    message = gen * JubjubFr(42)
    cipher = ElgamalCipher.encrypt(r, public, gen, message)
    assert cipher.decrypt(secret) == message
    assert cipher.decrypt(JubjubFr(1)) != message


def test_elgamal_homomorphic_and_serde():
    secret = JubjubFr(55)
    gen = JubjubExtended.generator()
    public = gen * secret
    m1 = gen * JubjubFr(7)
    m2 = gen * JubjubFr(11)
    c1 = ElgamalCipher.encrypt(JubjubFr(3), public, gen, m1)
    c2 = ElgamalCipher.encrypt(JubjubFr(4), public, gen, m2)
    assert (c1 + c2).decrypt(secret) == m1 + m2
    blob = c1.to_bytes()
    assert len(blob) == 64
    assert ElgamalCipher.from_bytes(blob) == c1


def test_poseidon_encrypt_roundtrip():
    secret = dhke(JubjubFr(99), JubjubExtended.generator_nums())
    nonce = Fr(777)
    message = [Fr(1), Fr(2), Fr(3)]
    cipher = encrypt(message, secret, nonce)
    assert len(cipher) == len(message) + 1
    assert decrypt(cipher, secret, nonce) == message


def test_poseidon_decrypt_rejects_tamper():
    secret = dhke(JubjubFr(99), JubjubExtended.generator_nums())
    nonce = Fr(777)
    cipher = encrypt([Fr(5)], secret, nonce)
    bad = list(cipher)
    bad[0] = bad[0] + Fr.one()
    with pytest.raises(DecryptionError):
        decrypt(bad, secret, nonce)
    with pytest.raises(DecryptionError):
        decrypt(cipher, secret, nonce + Fr.one())


def test_encrypt_gadget_matches_native():
    secret = dhke(JubjubFr(4321), JubjubExtended.generator())
    nonce = Fr(31337)
    message = [Fr(10), Fr(20)]
    native_cipher = encrypt(message, secret, nonce)

    composer = Composer.initialized()
    secret_point = composer.append_point(secret)
    nonce_w = composer.append_witness(nonce)
    msg_w = [composer.append_witness(m) for m in message]
    cipher_w = encrypt_gadget(composer, msg_w, secret_point, nonce_w)
    assert [composer[w] for w in cipher_w] == native_cipher

    # decrypt gadget recovers the message witnesses
    composer2 = Composer.initialized()
    secret_point2 = composer2.append_point(secret)
    nonce_w2 = composer2.append_witness(nonce)
    cipher_in = [composer2.append_witness(c) for c in native_cipher]
    msg_out = decrypt_gadget(composer2, cipher_in, secret_point2, nonce_w2)
    assert [composer2[w] for w in msg_out] == message
