"""Unit tests for barcode codecs, log-prob normalization, and the whitelist
dict (reference behaviors: src/util.c, src/barcodes.c, src/techs.c)."""

import math

import numpy as np
import pytest

from ema_tpu.utils import barcodes as bc
from ema_tpu.utils.logprobs import normalize_log_probs, normalize_log_probs_batch
from ema_tpu.utils.whitelist import BarcodeDict


class TestBarcodeCodec:
    def test_roundtrip_default(self):
        s = "ACGTACGTACGTACGT"
        v = bc.encode_bc_default(s)
        assert bc.decode_bc_default(v, 16) == s

    def test_first_base_in_low_bits(self):
        # reference encodes last-base-first with left shifts, so the FIRST
        # base occupies the lowest 2 bits (src/util.c:41-61)
        assert bc.encode_bc_default("CAAA") == 1
        assert bc.encode_bc_default("AAAC") == 1 << 6
        assert bc.encode_bc_default("T") == 3

    def test_roundtrip_haplotag(self):
        s = "A12C34B56D78"
        v = bc.encode_bc_haplotag(s)
        assert v == (12 << 24) | (34 << 16) | (56 << 8) | 78
        assert bc.decode_bc_haplotag(v) == s

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, size=(50, 16), dtype=np.uint8)
        batch = bc.encode_bc_batch(codes)
        for i in range(50):
            s = bc.bases_to_str(codes[i])
            assert batch[i] == bc.encode_bc_default(s)
        back = bc.decode_bc_batch(batch, 16)
        assert (back == codes).all()

    def test_extract_10x(self):
        rid, v = bc.extract_bc_from_id("@read1:2000:ACGTACGTACGTACGT", "10x")
        assert rid == "read1:2000"
        assert v == bc.encode_bc_default("ACGTACGTACGTACGT")

    def test_extract_10x_longranger_space(self):
        rid, v = bc.extract_bc_from_id("@read1 extra:AAAA", "10x")
        assert rid == "read1"

    def test_extract_tellseq_bx(self):
        rid, v = bc.extract_bc_from_id("@r7 BX:Z:ACGTACGTACGTACGTAC", "tellseq")
        assert rid == "r7"
        assert v == bc.encode_bc_default("ACGTACGTACGTACGTAC")

    def test_extract_tru(self):
        rid, v = bc.extract_bc_from_id("@1234", "tru")
        assert v == 1234

    def test_extract_cpt(self):
        # cpt: atoi of the text starting 2 chars past the last ':'
        rid, v = bc.extract_bc_from_id("@xx:BC42", "cpt")
        assert v == 42


class TestNormalizeLogProbs:
    def test_single(self):
        assert normalize_log_probs(np.array([-123.0]))[0] == 1.0

    def test_softmax(self):
        p = np.array([math.log(0.5), math.log(0.25), math.log(0.25)])
        out = normalize_log_probs(p)
        np.testing.assert_allclose(out, [0.5, 0.25, 0.25], rtol=1e-12)
        assert abs(out.sum() - 1.0) < 1e-12

    def test_epsilon_floor(self):
        # entries more than log(1e-50)-log(n) below the max become exactly 0
        p = np.array([0.0, -200.0])
        out = normalize_log_probs(p)
        assert out[1] == 0.0
        assert out[0] == 1.0

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(1)
        B, C = 20, 7
        mat = rng.normal(-30, 10, size=(B, C))
        mask = rng.random((B, C)) < 0.7
        mask[:, 0] = True
        out = normalize_log_probs_batch(mat, mask)
        for i in range(B):
            vals = mat[i][mask[i]]
            exp = normalize_log_probs(vals)
            np.testing.assert_allclose(out[i][mask[i]], exp, rtol=1e-12)
            assert (out[i][~mask[i]] == 0).all()


class TestWhitelist:
    def _dict(self):
        rng = np.random.default_rng(2)
        bcs = np.unique(rng.integers(0, 2**32, size=1000, dtype=np.uint64))
        return BarcodeDict.from_barcodes(bcs), bcs

    def test_lookup(self):
        d, bcs = self._dict()
        idx = d.lookup(bcs[:100])
        assert (idx >= 0).all()
        assert (d.barcodes[idx] == bcs[:100]).all()
        missing = np.array([1, 2, 3], dtype=np.uint64)
        present = d.lookup(missing) >= 0
        for i, m in enumerate(missing):
            assert present[i] == (m in set(bcs.tolist()))

    def test_priors(self):
        d, bcs = self._dict()
        d.increment(d.barcodes[:10])
        d.compute_priors()
        total = d.size + 10
        np.testing.assert_allclose(d.priors[:10], 2.0 / total)
        np.testing.assert_allclose(d.priors[10:], 1.0 / total)
        assert abs(d.priors.sum() - 1.0) < 1e-9

    def test_bucket_monotone(self):
        d, _ = self._dict()
        b = d.get_bucket(np.arange(d.size), 50)
        assert b.min() == 0 and b.max() == 49
        assert (np.diff(b) >= 0).all()

    def test_serialize_roundtrip(self, tmp_path):
        d, _ = self._dict()
        d.counts[:] = np.arange(d.size)
        p = str(tmp_path / "dict.bin")
        d.serialize(p)
        d2 = BarcodeDict.deserialize(p)
        assert (d2.barcodes == d.barcodes).all()
        assert (d2.counts == d.counts).all()

    def test_serialized_jumpgate_semantics(self, tmp_path):
        # jumpgate[h] must be the index of the first entry with hi24 >= h
        d, _ = self._dict()
        p = str(tmp_path / "dict.bin")
        d.serialize(p)
        with open(p, "rb") as f:
            jump = np.frombuffer(f.read((1 << 24) * 4), dtype="<u4")
        hi = ((d.barcodes & np.uint64(0xFFFFFF00)) >> np.uint64(8)).astype(np.int64)
        for h in [0, int(hi[0]), int(hi[-1]), (1 << 24) - 1]:
            expect = int(np.searchsorted(hi, h))
            assert jump[h] == expect
