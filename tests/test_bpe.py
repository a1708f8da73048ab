"""Byte-level BPE engine (kernel/bpe.py): tiktoken-semantics merge
loop, .tiktoken loader, cl100k pre-tokenizer behavior, and the
token_count_cl100k precedence chain."""

import base64

import pytest


def _mini_ranks(extra):
    ranks = {bytes([b]): b for b in range(256)}
    for i, tok in enumerate(extra):
        ranks[tok] = 256 + i
    return ranks


class TestMergeLoop:
    def test_lowest_rank_merges_first(self):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        # 'bc' (rank 256) outranks 'ab' (257): "abc" -> a + bc
        enc = BPEEncoder(_mini_ranks([b"bc", b"ab"]))
        assert enc.encode("abc") == [ord("a"), 256]
        # flip priorities: 'ab' merges first -> ab + c
        enc2 = BPEEncoder(_mini_ranks([b"ab", b"bc"]))
        assert enc2.encode("abc") == [256, ord("c")]

    def test_leftmost_occurrence_first(self):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        # overlapping pair: "aaa" with only 'aa' -> [aa, a]
        enc = BPEEncoder(_mini_ranks([b"aa"]))
        assert enc.encode("aaa") == [256, ord("a")]

    def test_cascading_merges(self):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        enc = BPEEncoder(_mini_ranks([b"ab", b"abc", b"abcd"]))
        assert enc.encode("abcd") == [258]
        assert enc.encode("abcx") == [257, ord("x")]

    def test_whole_piece_shortcut(self):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        enc = BPEEncoder(_mini_ranks([b"hi"]))
        assert enc.encode("hi") == [256]

    def test_requires_all_single_bytes(self):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        ranks = {bytes([b]): b for b in range(255)}  # byte 255 missing
        with pytest.raises(ValueError):
            BPEEncoder(ranks)


class TestPreTokenizer:
    def _pieces(self, text):
        import regex

        from pdf_extractor_ray.kernel.bpe import CL100K_PATTERN

        return regex.compile(CL100K_PATTERN).findall(text)

    def test_contractions_and_words(self):
        assert self._pieces("I'll don't") == ["I", "'ll", " don", "'t"]

    def test_digit_triples(self):
        assert self._pieces("12345") == ["123", "45"]

    def test_space_attaches_to_word_not_number(self):
        assert self._pieces(" word 42") == [" word", " ", "42"]

    def test_trailing_spaces_split_before_last(self):
        # "\s+(?!\S)" keeps trailing run whole; interior run leaves one
        # space for the next word
        assert self._pieces("a   b  ") == ["a", "  ", " b", "  "]

    def test_punct_swallows_newlines(self):
        assert self._pieces("end.\nNew") == ["end", ".\n", "New"]


class TestLoaderAndBuiltin:
    def test_tiktoken_file_roundtrip(self, tmp_path):
        from pdf_extractor_ray.kernel.bpe import BPEEncoder

        enc = BPEEncoder(_mini_ranks([b"ab", b" cd"]))
        p = str(tmp_path / "t.tiktoken")
        enc.to_tiktoken_file(p)
        # format check: base64 token + space + rank
        line0 = open(p, "rb").readline().split()
        assert base64.b64decode(line0[0]) == b"\x00" and line0[1] == b"0"
        enc2 = BPEEncoder.from_tiktoken_file(p)
        assert enc2.ranks == enc.ranks

    def test_builtin_roundtrip_and_totality(self):
        from pdf_extractor_ray.kernel.bpe import get_builtin_encoder

        enc = get_builtin_encoder()
        for text in [
            "the fast key order sort",          # in-domain (merged hard)
            "Zebra quartz vex 99999!",          # novel
            "naïve café — résumé 🎉",           # multibyte utf-8
            "\x00\x7f\twhitespace\n\n tail  ",  # control bytes
        ]:
            ids = enc.encode(text)
            assert enc.decode(ids) == text
            assert enc.count(text) == len(ids)

    def test_builtin_exact_count_pins(self):
        """Regression pins: retraining or loop changes that alter
        segmentation must be deliberate."""
        from pdf_extractor_ray.kernel.bpe import get_builtin_encoder

        enc = get_builtin_encoder()
        assert len(enc.ranks) == 383
        assert enc.count("the fast key order sort table scan") == 7
        assert enc.count("Zebra quartz vex!") == 14

    def test_merges_compress_in_domain_text(self):
        from pdf_extractor_ray.kernel.bpe import get_builtin_encoder

        enc = get_builtin_encoder()
        text = "table scan merge window batch stream"
        assert enc.count(text) < len(text.encode()) / 2


class TestCountPrecedence:
    def test_real_table_wins_when_present(self, tmp_path, monkeypatch):
        import pdf_extractor_ray.kernel.bpe as bpe
        from pdf_extractor_ray.kernel.bpe import BPEEncoder
        from pdf_extractor_ray.kernel.textutils import (
            token_count,
            token_count_cl100k,
        )

        # a stand-in 'cl100k' table where every byte is its own token
        # -> count == utf-8 byte length, distinguishable from both the
        # regex count and any pin
        enc = BPEEncoder({bytes([b]): b for b in range(256)})
        p = str(tmp_path / "cl100k_base.tiktoken")
        enc.to_tiktoken_file(p)
        monkeypatch.setenv("GRAFT_CL100K_PATH", p)
        monkeypatch.setattr(bpe, "_cl100k_cached", bpe._CL100K_SENTINEL)
        try:
            assert token_count_cl100k("hello world") == 11
        finally:
            monkeypatch.setattr(bpe, "_cl100k_cached", bpe._CL100K_SENTINEL)

    def test_offline_falls_back_to_pin_then_regex(self, monkeypatch):
        import pdf_extractor_ray.kernel.bpe as bpe
        from pdf_extractor_ray.kernel.cl100k_calibration import (
            cl100k_pinned_count,
        )
        from pdf_extractor_ray.kernel.textutils import (
            token_count,
            token_count_cl100k,
        )

        monkeypatch.delenv("GRAFT_CL100K_PATH", raising=False)
        monkeypatch.setattr(bpe, "_cl100k_cached", None)
        novel = "definitely not in the golden fixture 0xDEADBEEF"
        assert cl100k_pinned_count(novel) is None
        assert token_count_cl100k(novel) == token_count(novel)


class TestDistributedStage:
    def test_actor_pool_counts_match_serial(self, ray_session):
        """The distributed tokenizer stage equals serial driver-side
        encoding row for row, including OOV text that exercises the
        merge loop."""
        import pyarrow as pa

        from pdf_extractor_ray.functions.textstats import bpe_token_stats
        from pdf_extractor_ray.kernel.bpe import get_builtin_encoder

        texts = [
            f"the fast key order zq{i}vx novel-{i} café" for i in range(200)
        ]
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(200)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(8)
        out = (
            bpe_token_stats(ds, concurrency=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        enc = get_builtin_encoder()
        assert out["n_bpe_tokens"].tolist() == [enc.count(t) for t in texts]


class TestTrainer:
    def test_incremental_equals_naive_reference(self):
        """The incremental merge loop (kernel/bpe.py) must match a
        straight re-count-every-merge reference implementation."""
        from collections import Counter

        from pdf_extractor_ray.kernel.bpe import train_from_histogram

        hist = {
            b"lower": 5,
            b"lowest": 3,
            b"newer": 6,
            b"wider": 2,
            b"new": 4,
        }

        def naive(piece_freq, vocab_size):
            ranks = {bytes([b]): b for b in range(256)}
            segs = {
                p: [p[i : i + 1] for i in range(len(p))] for p in piece_freq
            }
            while len(ranks) < vocab_size:
                pc = Counter()
                for p, seg in segs.items():
                    for i in range(len(seg) - 1):
                        pc[(seg[i], seg[i + 1])] += piece_freq[p]
                if not pc:
                    break
                best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                merged = best[0] + best[1]
                if merged not in ranks:
                    ranks[merged] = len(ranks)
                for p, seg in segs.items():
                    i, out = 0, []
                    while i < len(seg):
                        if (
                            i + 1 < len(seg)
                            and seg[i] == best[0]
                            and seg[i + 1] == best[1]
                        ):
                            out.append(merged)
                            i += 2
                        else:
                            out.append(seg[i])
                            i += 1
                    segs[p] = out
            return ranks

        for v in (260, 270, 300):
            assert train_from_histogram(dict(hist), v) == naive(hist, v)

    def test_vendored_table_reproduced(self):
        """Re-training on the vendored table's corpus reproduces
        graft_bpe_small.tiktoken byte for byte (determinism gate for
        the shared merge loop)."""
        from collections import Counter

        import pyarrow.parquet as pq
        import regex as _regex

        from pdf_extractor_ray.kernel.bpe import (
            CL100K_PATTERN,
            get_builtin_encoder,
            train_from_histogram,
        )

        texts = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )["text"].to_pylist()
        pat = _regex.compile(CL100K_PATTERN)
        hist = Counter()
        for t in texts:
            for piece in pat.findall(t or ""):
                hist[piece.encode("utf-8")] += 1
        assert (
            train_from_histogram(dict(hist), 1024)
            == get_builtin_encoder().ranks
        )

    def test_distributed_equals_serial(self, ray_session):
        """train_bpe (Ray histogram -> merge loop) == the serial
        trainer on the same texts, and the encoder round-trips."""
        import pyarrow as pa

        from pdf_extractor_ray.functions.tokenizer import train_bpe
        from pdf_extractor_ray.kernel.bpe import train_from_histogram

        texts = [
            f"alpha beta gamma delta w{i % 17} repeat repeat token"
            for i in range(300)
        ]
        ds = ray_session.data.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(6)
        enc = train_bpe(ds, vocab_size=300, min_count=1)

        from collections import Counter
        import regex as _regex
        from pdf_extractor_ray.kernel.bpe import CL100K_PATTERN

        pat = _regex.compile(CL100K_PATTERN)
        hist = Counter()
        for t in texts:
            for piece in pat.findall(t):
                hist[piece.encode("utf-8")] += 1
        assert enc.ranks == train_from_histogram(dict(hist), 300)
        ids = enc.encode("alpha beta repeat zqvx")
        assert enc.decode(ids) == "alpha beta repeat zqvx"

    def test_min_count_prunes_singletons(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.functions.tokenizer import piece_histogram

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "text": pa.array(
                        ["common common rare1", "common rare2"], pa.string()
                    )
                }
            )
        )
        out = piece_histogram(ds, pattern=r"\S+", min_count=2).to_pandas()
        assert dict(zip(out["piece"], out["cnt"])) == {"common": 3}
