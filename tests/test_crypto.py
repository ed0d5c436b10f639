"""Crypto parity gates: known-answer vectors + MySQL-compat AES semantics.

Reference: pkg/sql/plan/function/func_binary.go:12240 (generateAESKey XOR
fold), :12360 (getAESMode: aes-128-ecb default / aes-256-cbc + IV),
func_binary_aes_test.go (roundtrip + missing-IV -> NULL cases).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from matrixone_spark.functions import crypto as C


def one(spark, col, name="v"):
    return spark.range(1).select(col.alias(name)).collect()[0][name]


def test_fold_key_reference_semantics():
    # len == keyLen folds to itself (XOR into zeros)
    assert C.fold_key(bytes(range(16)), 16) == bytes(range(16))
    # wrap-around XOR: byte 16 XORs into slot 0
    k = C.fold_key(b"A" * 17, 16)
    assert k[0] == 0 and k[1:] == b"A" * 15
    with pytest.raises(ValueError):
        C.fold_key(b"x", 24)


def test_aes_ecb_fips197_first_block(spark):
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = one(spark, C.aes_encrypt(F.lit(pt), key))
    assert ct[:16].hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert len(ct) == 32  # PKCS7 pads a full block


def test_aes_ecb_roundtrip_and_wrong_key(spark):
    enc = C.aes_encrypt(F.lit("hello"), "secret-key")
    assert one(spark, C.aes_decrypt(enc, "secret-key").cast("string")) == "hello"
    # wrong key -> NULL (MySQL behavior), not an exception
    assert one(spark, C.aes_decrypt(enc, "wrong-key").cast("string")) is None


def test_aes_cbc_layout_and_iv_rules(spark):
    iv = "0123456789abcdef"
    enc = C.aes_encrypt(F.lit("hello cbc"), "secret-key-for-cbc", "aes-256-cbc", iv)
    # MySQL layout: ciphertext only, no IV prefix -> one padded block
    assert len(one(spark, enc)) == 16
    dec = C.aes_decrypt(enc, "secret-key-for-cbc", "aes-256-cbc", iv)
    assert one(spark, dec.cast("string")) == "hello cbc"
    # missing / short IV -> NULL (func_binary_aes_test.go TestAESEncryptCBCMissingIV)
    assert one(spark, C.aes_encrypt(F.lit("x"), "k", "aes-256-cbc", None)) is None
    assert one(spark, C.aes_encrypt(F.lit("x"), "k", "aes-256-cbc", "short")) is None
    # wrong IV decrypts to garbage or NULL, never the plaintext
    bad = one(spark, C.aes_decrypt(enc, "secret-key-for-cbc", "aes-256-cbc", "fedcba9876543210").cast("string"))
    assert bad != "hello cbc"


def test_sha_known_answers(spark):
    assert one(spark, C.sha1(F.lit("abc"))) == hashlib.sha1(b"abc").hexdigest()
    for bits, h in ((224, hashlib.sha224), (256, hashlib.sha256), (384, hashlib.sha384), (512, hashlib.sha512)):
        assert one(spark, C.sha2(F.lit("abc"), bits)) == h(b"abc").hexdigest()
    # MySQL: sha2(x, 0) == sha2(x, 256)
    assert one(spark, C.sha2(F.lit("abc"), 0)) == hashlib.sha256(b"abc").hexdigest()
