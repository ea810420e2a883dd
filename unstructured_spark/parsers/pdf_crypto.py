"""PDF Standard Security Handler decryption (empty user password).

Many "copy-protected" PDFs set only an OWNER password — the user
password is empty, so any conforming reader decrypts silently (the
reference partitions ``example-docs/pdf/copy-protected.pdf`` this way
via pdfminer; reference strategy table expects it text-extractable,
``test_strategies.py:34-41``). This module implements the published
algorithms from ISO 32000-1 §7.6 with stdlib only:

- revision 2/3/4 key derivation (Algorithm 2: padded password + /O +
  /P + file ID, MD5, 50-fold iteration for R≥3);
- per-object keys (Algorithm 1: MD5(key + objnum₃ + gen₂ [+ 'sAlT']));
- RC4 and AES-128-CBC (the AESV2 crypt filter) — AES inverse cipher
  implemented from the FIPS-197 tables.

Only decryption with the EMPTY user password is supported; a
non-empty password raises ``PdfEncryptedError`` (matching the
reference's behavior of failing partition for ``password.pdf``).
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class PdfEncryptedError(ValueError):
    """Encryption this handler cannot open (non-empty user password or
    an unsupported /V revision)."""


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --- AES-128 inverse cipher (FIPS-197) -------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


_MUL = [[0] * 256 for _ in range(16)]
for _c in range(256):
    acc = {1: _c}
    x = _c
    for _p in (2, 4, 8):
        x = _xtime(x)
        acc[_p] = x
    for _f in (2, 3, 9, 11, 13, 14):
        v = 0
        for _bit in (1, 2, 4, 8):
            if _f & _bit:
                v ^= acc[_bit]
        _MUL[_f][_c] = v


def _expand_key(key: bytes) -> list[bytes]:
    """AES key schedule for 128- or 256-bit keys (FIPS-197 §5.2):
    returns the 11 (AES-128) or 15 (AES-256) round keys."""
    nk = len(key) // 4
    rounds = {4: 10, 8: 14}[nk]
    words = [key[i : i + 4] for i in range(0, len(key), 4)]
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                (_SBOX[t[1]] ^ (rcon if j == 0 else 0)) if j == 0
                else _SBOX[t[(j + 1) % 4]]
                for j in range(4)
            )
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[r * 4 : r * 4 + 4]) for r in range(rounds + 1)]


def _aes_encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    """Forward cipher (needed by the R6 hardened hash, which AES-CBC-
    ENCRYPTS its round input)."""
    n = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, n):
        # SubBytes + ShiftRows (row r rotates LEFT by r)
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[c * 4 + r] = _SBOX[s[((c + r) % 4) * 4 + r]]
        # MixColumns
        for c in range(4):
            a0, a1, a2, a3 = t[c * 4 : c * 4 + 4]
            s[c * 4 + 0] = _MUL[2][a0] ^ _MUL[3][a1] ^ a2 ^ a3
            s[c * 4 + 1] = a0 ^ _MUL[2][a1] ^ _MUL[3][a2] ^ a3
            s[c * 4 + 2] = a0 ^ a1 ^ _MUL[2][a2] ^ _MUL[3][a3]
            s[c * 4 + 3] = _MUL[3][a0] ^ a1 ^ a2 ^ _MUL[2][a3]
        s = bytearray(a ^ b for a, b in zip(s, rk[rnd]))
    t = bytearray(16)
    for c in range(4):
        for r in range(4):
            t[c * 4 + r] = _SBOX[s[((c + r) % 4) * 4 + r]]
    return bytes(a ^ b for a, b in zip(t, rk[n]))


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        enc = _aes_encrypt_block(rk, blk)
        out.extend(enc)
        prev = enc
    return bytes(out)


def _aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt with an explicit IV and no padding strip (the
    AES-256 /UE file-key unwrap uses a zero IV and no padding)."""
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, (len(data) // 16) * 16, 16):
        blk = data[i : i + 16]
        dec = _aes_decrypt_block(rk, blk)
        out.extend(a ^ b for a, b in zip(dec, prev))
        prev = blk
    return bytes(out)


def _aes_decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    n = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[n]))
    for rnd in range(n - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[((c + r) % 4) * 4 + r] = _INV_SBOX[s[c * 4 + r]]
        # AddRoundKey
        k = rk[rnd]
        t = bytearray(a ^ b for a, b in zip(t, k))
        # InvMixColumns
        for c in range(4):
            a0, a1, a2, a3 = t[c * 4 : c * 4 + 4]
            s[c * 4 + 0] = _MUL[14][a0] ^ _MUL[11][a1] ^ _MUL[13][a2] ^ _MUL[9][a3]
            s[c * 4 + 1] = _MUL[9][a0] ^ _MUL[14][a1] ^ _MUL[11][a2] ^ _MUL[13][a3]
            s[c * 4 + 2] = _MUL[13][a0] ^ _MUL[9][a1] ^ _MUL[14][a2] ^ _MUL[11][a3]
            s[c * 4 + 3] = _MUL[11][a0] ^ _MUL[13][a1] ^ _MUL[9][a2] ^ _MUL[14][a3]
    t = bytearray(16)
    for c in range(4):
        for r in range(4):
            t[((c + r) % 4) * 4 + r] = _INV_SBOX[s[c * 4 + r]]
    return bytes(a ^ b for a, b in zip(t, rk[0]))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-128-CBC with the 16-byte IV prefixed to the ciphertext (the
    PDF AESV2 layout) and PKCS#5-style padding stripped."""
    if len(data) < 32:
        return b""
    rk = _expand_key(key)
    iv = data[:16]
    body = data[16 : 16 + ((len(data) - 16) // 16) * 16]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        blk = body[i : i + 16]
        dec = _aes_decrypt_block(rk, blk)
        out.extend(a ^ b for a, b in zip(dec, prev))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def _hardened_hash(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Revision-6 hash (ISO 32000-2 Algorithm 2.B): SHA-256 seed, then
    rounds of AES-128-CBC-encrypting 64 repetitions of pwd+K+udata and
    rehashing with SHA-256/384/512 chosen by the ciphertext mod 3,
    until round ≥ 64 and the last ciphertext byte ≤ round - 32."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardDecryptor:
    """Per-object decryptor for the Standard handler: V1/2 (RC4),
    V4 (RC4 or AES-128 crypt filters), V5 (AES-256, R5/R6) — empty
    user password only."""

    def __init__(self, enc: dict, file_id: bytes):
        v = int(enc.get("/V", 0) or 0)
        r = int(enc.get("/R", 2) or 2)
        if v == 5:
            u, ue = enc.get("/U"), enc.get("/UE")
            if not (isinstance(u, bytes) and len(u) >= 48 and isinstance(ue, bytes)):
                raise PdfEncryptedError("malformed AES-256 /U//UE entries")
            vsalt, ksalt = u[32:40], u[40:48]
            if r >= 6:
                check = _hardened_hash(b"", vsalt)
                inter = _hardened_hash(b"", ksalt)
            else:  # R5 (deprecated Adobe extension): plain SHA-256
                check = hashlib.sha256(vsalt).digest()
                inter = hashlib.sha256(ksalt).digest()
            if check != u[:32]:
                raise PdfEncryptedError("document requires a user password")
            self.key = _aes_cbc_decrypt_raw(inter, b"\x00" * 16, ue[:32])
            self.aes = True
            self.v5 = True
            self.r = r
            return
        self.v5 = False
        if v not in (1, 2, 4):
            raise PdfEncryptedError(f"unsupported /Encrypt /V {v}")
        length = int(enc.get("/Length", 40) or 40) // 8
        self.aes = False
        if v == 4:
            cf = enc.get("/CF") or {}
            stdcf = cf.get("/StdCF") if isinstance(cf, dict) else None
            cfm = (stdcf or {}).get("/CFM") if isinstance(stdcf, dict) else None
            if cfm == "/AESV2":
                self.aes = True
                length = 16
            elif cfm not in ("/V2", None):
                raise PdfEncryptedError(f"unsupported crypt filter {cfm}")
        o = enc.get("/O")
        p = int(enc.get("/P", -1) or -1)
        if not isinstance(o, bytes):
            raise PdfEncryptedError("missing /O entry")
        h = hashlib.md5()
        h.update(_PAD)  # empty user password → pad only
        h.update(o[:32])
        h.update(struct.pack("<i", p))
        h.update(file_id)
        if r >= 4 and not bool(enc.get("/EncryptMetadata", True)):
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:length]).digest()
        self.key = key[:length]
        self.r = r
        # verify the empty user password against /U (Algorithm 4/5);
        # tolerate a missing /U, reject a clear mismatch
        u = enc.get("/U")
        if isinstance(u, bytes) and len(u) >= 16:
            if r == 2:
                ok = rc4(self.key, _PAD) == u[:32]
            else:
                h2 = hashlib.md5(_PAD + file_id).digest()
                step = rc4(self.key, h2)
                for i in range(1, 20):
                    step = rc4(bytes(b ^ i for b in self.key), step)
                ok = step == u[:16]
            if not ok:
                raise PdfEncryptedError("document requires a user password")

    def object_key(self, num: int, gen: int) -> bytes:
        if self.v5:
            return self.key  # AES-256 uses the file key for every object
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", gen)[:2])
        if self.aes:
            h.update(b"sAlT")
        n = min(len(self.key) + 5, 16)
        return h.digest()[:n]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = self.object_key(num, gen)
        if self.aes:
            return aes_cbc_decrypt(k, data)
        return rc4(k, data)
