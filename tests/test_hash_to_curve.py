"""RFC 9380 hash-to-curve golden vectors (BLS12381G1_XMD:SHA-256_SSWU).

The same published vectors the reference commits in
coset-bls12_381/src/hash_to_curve/map_g1.rs:757-880.
"""

from zkvm_tpu.curves.hash_to_curve import (encode_to_curve_g1,
                                           expand_message_xmd,
                                           hash_to_curve_g1)

NU_DST = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_NU_"
RO_DST = b"QUUX-V01-CS02-with-BLS12381G1_XMD:SHA-256_SSWU_RO_"

ENCODE_CASES = [
    (b"", "184bb665c37ff561a89ec2122dd343f20e0f4cbcaec84e3c3052ea81d1834e192c426074b02ed3dca4e7676ce4ce48ba" "04407b8d35af4dacc809927071fc0405218f1401a6d15af775810e4e460064bcc9468beeba82fdc751be70476c888bf3"),
    (b"abc", "009769f3ab59bfd551d53a5f846b9984c59b97d6842b20a2c565baa167945e3d026a3755b6345df8ec7e6acb6868ae6d" "1532c00cf61aa3d0ce3e5aa20c3b531a2abd2c770a790a2613818303c6b830ffc0ecf6c357af3317b9575c567f11cd2c"),
    (b"abcdef0123456789", "1974dbb8e6b5d20b84df7e625e2fbfecb2cdb5f77d5eae5fb2955e5ce7313cae8364bc2fff520a6c25619739c6bdcb6a" "15f9897e11c6441eaa676de141c8d83c37aab8667173cbe1dfd6de74d11861b961dccebcd9d289ac633455dfcc7013a3"),
    (b"q128_qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq","0a7a047c4a8397b3446450642c2ac64d7239b61872c9ae7a59707a8f4f950f101e766afe58223b3bff3a19a7f754027c""1383aebba1e4327ccff7cf9912bda0dbc77de048b71ef8c8a81111d71dc33c5e3aa6edee9cf6f5fe525d50cc50b77cc9"),
    (b"a512_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa","0e7a16a975904f131682edbb03d9560d3e48214c9986bd50417a77108d13dc957500edf96462a3d01e62dc6cd468ef11""0ae89e677711d05c30a48d6d75e76ca9fb70fe06c6dd6ff988683d89ccde29ac7d46c53bb97a59b1901abf1db66052db"),
]

HASH_CASES = [
    (b"", "052926add2207b76ca4fa57a8734416c8dc95e24501772c814278700eed6d1e4e8cf62d9c09db0fac349612b759e79a1" "08ba738453bfed09cb546dbb0783dbb3a5f1f566ed67bb6be0e8c67e2e81a4cc68ee29813bb7994998f3eae0c9c6a265"),
    (b"abc", "03567bc5ef9c690c2ab2ecdf6a96ef1c139cc0b2f284dca0a9a7943388a49a3aee664ba5379a7655d3c68900be2f6903" "0b9c15f3fe6e5cf4211f346271d7b01c8f3b28be689c8429c85b67af215533311f0b8dfaaa154fa6b88176c229f2885d"),
    (b"abcdef0123456789", "11e0b079dea29a68f0383ee94fed1b940995272407e3bb916bbf268c263ddd57a6a27200a784cbc248e84f357ce82d98" "03a87ae2caf14e8ee52e51fa2ed8eefe80f02457004ba4d486d6aa1f517c0889501dc7413753f9599b099ebcbbd2d709"),
    (b"q128_qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq","15f68eaa693b95ccb85215dc65fa81038d69629f70aeee0d0f677cf22285e7bf58d7cb86eefe8f2e9bc3f8cb84fac488""1807a1d50c29f430b8cafc4f8638dfeeadf51211e1602a5f184443076715f91bb90a48ba1e370edce6ae1062f5e6dd38"),
    (b"a512_aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa","082aabae8b7dedb0e78aeb619ad3bfd9277a2f77ba7fad20ef6aabdc6c31d19ba5a6d12283553294c1825c4b3ca2dcfe""05b84ae5a942248eea39e1d91030458c40153f3b654ab7872d779ad1e942856a20c438e8d99bc8abfbf74729ce1f7ac8"),
]


def test_encode_to_curve_vectors():
    for msg, expected in ENCODE_CASES:
        p = encode_to_curve_g1(msg, NU_DST).to_affine()
        assert p.to_uncompressed().hex() == expected, msg


def test_hash_to_curve_vectors():
    for msg, expected in HASH_CASES:
        p = hash_to_curve_g1(msg, RO_DST).to_affine()
        assert p.to_uncompressed().hex() == expected, msg


def test_expand_message_xmd_basic():
    out = expand_message_xmd(b"abc", b"QUUX-V01-CS02-with-expander-SHA256-128", 32)
    assert len(out) == 32
    out2 = expand_message_xmd(b"abc", b"QUUX-V01-CS02-with-expander-SHA256-128", 128)
    assert out2[:0] == b"" and len(out2) == 128


# -- expand_message_xof (RFC 9380 K.6 / expand_msg.rs:800-930 vectors) --------

def test_expand_message_xof_shake128_vectors():
    from zkvm_tpu.curves.hash_to_curve import expand_message_xof

    dst = b"QUUX-V01-CS02-with-expander-SHAKE128"
    q128 = b"q128_" + b"q" * 128
    a512 = b"a512_" + b"a" * 512
    vectors_32 = [
        (b"", "86518c9cd86581486e9485aa74ab35ba150d1c75c88e26b7"
              "043e44e2acd735a2"),
        (b"abc", "8696af52a4d862417c0763556073f47bc9b9ba43c99b5053"
                 "05cb1ec04a9ab468"),
        (b"abcdef0123456789", "912c58deac4821c3509dbefa094df54b34b8f5d01a19"
                              "1d1d3108a2c89077acca"),
        (q128, "1adbcc448aef2a0cebc71dac9f756b22e51839d348e031e6"
               "3b33ebb50faeaf3f"),
        (a512, "df3447cc5f3e9a77da10f819218ddf31342c310778e0e4ef"
               "72bbaecee786a4fe"),
    ]
    for msg, expect in vectors_32:
        assert expand_message_xof(msg, dst, 0x20).hex() == expect, msg[:16]

    vectors_128 = [
        (b"", "7314ff1a155a2fb99a0171dc71b89ab6e3b2b7d59e38e64419b8b6294d03"
              "ffee42491f11370261f436220ef787f8f76f5b26bdcd850071920ce023f3"
              "ac46847744f4612b8714db8f5db83205b2e625d95afd7d7b4d3094d3bdde"
              "815f52850bb41ead9822e08f22cf41d615a303b0d9dde73263c049a7b989"
              "8208003a739a2e57"),
        (b"abc", "c952f0c8e529ca8824acc6a4cab0e782fc3648c563ddb00da7399f2ae3"
                 "5654f4860ec671db2356ba7baa55a34a9d7f79197b60ddae6e64768a37"
                 "d699a78323496db3878c8d64d909d0f8a7de4927dcab0d3dbbc26cb20a"
                 "49eceb0530b431cdf47bc8c0fa3e0d88f53b318b6739fbed7d7634974f"
                 "1b5c386d6230c76260d5337a"),
        (b"abcdef0123456789",
         "19b65ee7afec6ac06a144f2d6134f08eeec185f1a890fe34e68f0e377b7d0312"
         "883c048d9b8a1d6ecc3b541cb4987c26f45e0c82691ea299b5e6889bbfe58915"
         "3016d8131717ba26f07c3c14ffbef1f3eff9752e5b6183f43871a78219a75e70"
         "00fbac6a7072e2b83c790a3a5aecd9d14be79f9fd4fb180960a3772e08680495"),
    ]
    for msg, expect in vectors_128:
        assert expand_message_xof(msg, dst, 0x80).hex() == expect, msg[:16]
