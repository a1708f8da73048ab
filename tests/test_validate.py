"""Record validation + dead-letter routing (functions/validate.py)."""

import pyarrow as pa

from pdf_extractor_ray.functions.validate import (
    page_rules,
    route_quarantine,
    schema_gate,
    validation_reasons,
)


def _batch(**cols):
    n = max(len(v) for v in cols.values())
    out = {}
    out["url"] = pa.array(cols.get("url", ["https://a.com/x"] * n), pa.string())
    out["fetch_ms"] = pa.array(
        cols.get("fetch_ms", [1_700_000_000_000] * n), pa.int64()
    )
    out["text"] = pa.array(cols.get("text", ["body text"] * n), pa.string())
    out["lang"] = pa.array(cols.get("lang", ["en"] * n), pa.string())
    return pa.table(out)


class TestValidationReasons:
    def test_all_ok(self):
        r = validation_reasons(_batch(url=["https://a.com"] * 3), page_rules())
        assert r.to_pylist() == ["ok", "ok", "ok"]

    def test_first_failing_rule_wins(self):
        # row violates BOTH url_scheme and lang_unknown; priority says
        # url_scheme
        b = _batch(url=["ftp://x"], lang=["zz"])
        assert validation_reasons(b, page_rules()).to_pylist() == ["url_scheme"]

    def test_null_url_beats_everything(self):
        b = _batch(url=[None], text=[""], lang=["zz"])
        assert validation_reasons(b, page_rules()).to_pylist() == ["url_missing"]

    def test_each_rule_fires(self):
        b = _batch(
            url=[None, "ftp://x", "https://a", "https://a", "https://a", "https://a"],
            fetch_ms=[0, 0, 1, 1_700_000_000_000, 1_700_000_000_000, 1_700_000_000_000],
            text=["t", "t", "t", "", "x" * 50, "t"],
            lang=["en", "en", "en", "en", "en", "zz"],
        )
        r = validation_reasons(b, page_rules(max_chars=10)).to_pylist()
        assert r == [
            "url_missing", "url_scheme", "ts_out_of_range",
            "text_empty", "text_oversize", "lang_unknown",
        ]

    def test_null_text_and_null_ts_route_not_raise(self):
        b = pa.table(
            {
                "url": pa.array(["https://a.com", "https://b.com"], pa.string()),
                "fetch_ms": pa.array([None, 1_700_000_000_000], pa.int64()),
                "text": pa.array(["t", None], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
            }
        )
        r = validation_reasons(b, page_rules()).to_pylist()
        assert r == ["ts_out_of_range", "text_empty"]


class TestRouting:
    def test_quarantine_partitions_the_stream(self, ray_session):
        import ray as _ray

        rows = [
            {"url": f"https://a.com/{i}" if i % 3 else None,
             "fetch_ms": 1_700_000_000_000, "text": "t", "lang": "en"}
            for i in range(30)
        ]
        gated = schema_gate(_ray.data.from_items(rows))
        ok, dead = route_quarantine(gated)
        ok_df, dead_df = ok.to_pandas(), dead.to_pandas()
        assert len(ok_df) == 20 and len(dead_df) == 10
        assert (ok_df["reason"] == "ok").all()
        assert (dead_df["reason"] == "url_missing").all()
