"""cl100k_base drop-in validation (skip-if-absent).

The BPE engine (kernel/bpe.py) implements tiktoken's exact merge
semantics; the real 100k-entry ranks table is not shipped in this
offline environment. The day a real ``cl100k_base.tiktoken`` file
lands at ``$GRAFT_CL100K_PATH`` (or
``pdf_extractor_ray/data/cl100k_base.tiktoken``), this test proves
exact tiktoken parity on public test vectors instead of assuming it.

Vectors are public knowledge: the ``tiktoken`` README's own
cl100k_base example plus widely-reproduced encodings.
"""

import pytest

# (text, expected cl100k_base ids) — the first is verbatim from the
# tiktoken README; the others are standard public examples.
CL100K_VECTORS = [
    ("tiktoken is great!", [83, 1609, 5963, 374, 2294, 0]),
    ("hello world", [15339, 1917]),
]


def _real_encoder():
    from pdf_extractor_ray.kernel.bpe import get_cl100k_encoder

    enc = get_cl100k_encoder()
    if enc is None:
        pytest.skip(
            "real cl100k_base.tiktoken not present "
            "(set $GRAFT_CL100K_PATH to enable)"
        )
    # the vendored self-trained table is tiny; a real cl100k table has
    # ~100k ranks — don't false-pass against the stand-in
    if len(enc.ranks) < 100_000:
        pytest.skip(
            f"table at hand has {len(enc.ranks)} ranks — not the real "
            "cl100k_base (100,256 ranks); skipping parity check"
        )
    return enc


class TestCl100kParity:
    def test_public_vectors_exact(self):
        enc = _real_encoder()
        for text, ids in CL100K_VECTORS:
            assert enc.encode(text) == ids, text

    def test_roundtrip(self):
        enc = _real_encoder()
        for text, _ in CL100K_VECTORS:
            assert enc.decode(enc.encode(text)) == text

    def test_counts_match_encode_len(self):
        enc = _real_encoder()
        for text, ids in CL100K_VECTORS:
            assert enc.count(text) == len(ids)
