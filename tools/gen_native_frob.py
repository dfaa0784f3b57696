"""Generate the Montgomery-form Frobenius constants for native/bls.c.

FROB6_C1 = (u+1)^((p-1)/3), FROB6_C2 = (u+1)^(2(p-1)/3),
FROB12_C1 = (u+1)^((p-1)/6), each an Fp2 element printed as C limb
initializers (6x u64 LE, Montgomery form value*R mod p).
"""

P = 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaaab
R = 1 << 384


def fp2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def fp2_pow(base, e):
    r = (1, 0)
    b = base
    while e:
        if e & 1:
            r = fp2_mul(r, b)
        b = fp2_mul(b, b)
        e >>= 1
    return r


def limbs(x):
    x = x * R % P  # to Montgomery
    return ", ".join(
        f"0x{(x >> (64 * i)) & ((1 << 64) - 1):016x}ULL" for i in range(6))


def emit(name, v):
    print(f"static const fp2 {name} = {{")
    print(f"    {{{{{limbs(v[0])}}}}},")
    print(f"    {{{{{limbs(v[1])}}}}}}};")


if __name__ == "__main__":
    emit("FROB6_C1", fp2_pow((1, 1), (P - 1) // 3))
    emit("FROB6_C2", fp2_pow((1, 1), 2 * (P - 1) // 3))
    emit("FROB12_C1", fp2_pow((1, 1), (P - 1) // 6))
