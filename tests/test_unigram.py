"""Unigram-LM tokenizer (kernel/unigram.py, functions/tokenizer.py)."""

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_ray.kernel.unigram import (
    UnigramModel,
    seed_candidates,
    train_unigram_from_histogram,
    viterbi_segment,
)


class TestHandLattice:
    def test_viterbi_prefers_whole_piece(self):
        # counts {a:10, b:5, ab:3}, T=18; word "ab":
        #   [ab]   -> 3/18    = 0.1667
        #   [a,b]  -> 50/324  = 0.1543
        # cross-multiplied: 3*18 = 54 > 50*1 -> [ab] wins
        counts = {"a": 10, "b": 5, "ab": 3}
        num, k, seq = viterbi_segment("ab", counts, 18, 4)
        assert seq == ("ab",)
        assert (num, k) == (3, 1)

    def test_viterbi_prefers_split_when_pieces_dominate(self):
        # counts {a:100, b:100, ab:1}, T=201; "ab":
        #   [ab]  -> 1/201; [a,b] -> 10000/201^2
        #   1*201 = 201 < 10000 -> split wins
        counts = {"a": 100, "b": 100, "ab": 1}
        _, _, seq = viterbi_segment("ab", counts, 201, 4)
        assert seq == ("a", "b")

    def test_tie_breaks_fewer_pieces_then_lex(self):
        # equal scores: {a:4, aa:2}, T=10; "aa":
        #   [aa] -> 2/10; [a,a] -> 16/100 -> cross: 2*100=200 > 160
        counts = {"a": 4, "aa": 2}
        _, _, seq = viterbi_segment("aa", counts, 10, 4)
        assert seq == ("aa",)
        # exact tie: {a:10, aa:10}, T=100: [aa]=10/100, [a,a]=100/1e4
        # cross: 10*10000 == 100*100 -> tie -> fewer pieces wins
        counts = {"a": 10, "aa": 10, "b": 80}
        _, _, seq = viterbi_segment("aa", counts, 100, 4)
        assert seq == ("aa",)

    def test_unknown_char_fallback(self):
        counts = {"a": 5}
        num, k, seq = viterbi_segment("ax", counts, 5, 4)
        assert seq == ("a", "x") and num == 0

    def test_seed_candidates_counts_occurrences(self):
        hist = {"aba": 2}
        cand = seed_candidates(hist, max_piece_len=2, seed_size=100)
        # 'a' occurs twice per word occurrence -> 4
        assert cand["a"] == 4 and cand["b"] == 2
        assert cand["ab"] == 2 and cand["ba"] == 2
        assert "aba" not in cand  # beyond max_piece_len

    def test_em_hand_example(self):
        # corpus: "abab" x3, "ab" x2. Seed (max_len 4, uncapped):
        # every substring. After one Viterbi round every word
        # segments as its own whole piece (if present) or best split;
        # then counts concentrate on 'abab' and 'ab'.
        hist = {"abab": 3, "ab": 2}
        model = train_unigram_from_histogram(
            hist, vocab_size=6, n_em=1, max_piece_len=4, seed_size=100
        )
        # whole words dominate; singles retained at floor >= 1
        assert model.counts["abab"] == 3
        assert model.counts["ab"] == 2
        assert model.counts["a"] >= 1 and model.counts["b"] >= 1
        assert model.encode("abab") == ["abab"]
        assert model.encode("ab") == ["ab"]


class TestDistributedEqualsSerial:
    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.RandomState(41)
        vocab = ["data", "token", "stream", "graph", "model", "train",
                 "corpus", "shard", "the", "of"]
        rows = []
        for i in range(120):
            n = rng.randint(8, 25)
            rows.append(
                {
                    "doc_id": np.int64(i),
                    "text": " ".join(
                        vocab[v] for v in rng.randint(0, len(vocab), n)
                    ),
                }
            )
        return pd.DataFrame(rows)

    def test_train_matches_serial(self, ray_session, corpus):
        import regex
        import ray.data

        from pdf_extractor_ray.functions.tokenizer import train_unigram
        from pdf_extractor_ray.kernel.bpe import CL100K_PATTERN

        dist = train_unigram(
            ray.data.from_pandas(corpus).repartition(7),
            vocab_size=300,
            n_em=2,
            max_piece_len=5,
            seed_size=10_000,
        )
        # serial: histogram with plain regex findall, same kernel
        pat = regex.compile(CL100K_PATTERN)
        hist: dict[str, int] = {}
        for t in corpus["text"]:
            for p in pat.findall(t):
                hist[p] = hist.get(p, 0) + 1
        serial = train_unigram_from_histogram(
            hist, 300, n_em=2, max_piece_len=5, seed_size=10_000
        )
        assert dist.counts == serial.counts
        assert dist.total == serial.total
        assert dist.piece_id == serial.piece_id

    def test_encode_matches_serial(self, ray_session, corpus):
        import hashlib

        import regex
        import ray.data

        from pdf_extractor_ray.functions.tokenizer import (
            train_unigram,
            unigram_encode_corpus,
        )
        from pdf_extractor_ray.kernel.bpe import CL100K_PATTERN

        model = train_unigram(
            ray.data.from_pandas(corpus).repartition(3),
            vocab_size=300,
            n_em=1,
            max_piece_len=5,
            seed_size=10_000,
        )
        got = (
            unigram_encode_corpus(
                ray.data.from_pandas(corpus).repartition(5), model
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pat = regex.compile(CL100K_PATTERN)
        want_rows = []
        for r in corpus.itertuples():
            toks = []
            for w in pat.findall(r.text):
                toks.extend(model.encode_ids(w))
            want_rows.append(
                (
                    r.doc_id,
                    len(toks),
                    hashlib.md5(
                        ",".join(map(str, toks)).encode()
                    ).hexdigest(),
                )
            )
        want = pd.DataFrame(
            want_rows, columns=["doc_id", "n_pieces", "pieces_md5"]
        ).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
