"""Property tests: form_kv_pairs invariants over random detections."""

from hypothesis import given, settings
from hypothesis import strategies as st

from unstructured_spark.operators.form_extraction import form_kv_pairs

_coord = st.integers(min_value=0, max_value=900)


@st.composite
def _boxes(draw):
    n_keys = draw(st.integers(1, 5))
    n_vals = draw(st.integers(0, 5))
    rows = []
    for i in range(n_keys + n_vals):
        x1, y1 = draw(_coord), draw(_coord)
        w = draw(st.integers(5, 120))
        h = draw(st.integers(5, 40))
        kind = "FormKey" if i < n_keys else "FormValue"
        rows.append(
            ("d", 1, i + 1 if kind == "FormKey" else 100 + i, kind,
             f"t{i}", float(x1), float(y1), float(x1 + w), float(y1 + h))
        )
    return rows


COLS = (
    "doc_id string, page_number int, box_id int, kind string, text string,"
    " x1 double, y1 double, x2 double, y2 double"
)


class TestFormPairingInvariants:
    @settings(max_examples=12, deadline=None)
    @given(_boxes())
    def test_invariants(self, spark, rows):
        det = spark.createDataFrame(rows, COLS)
        out = form_kv_pairs(det, skip_table_regions=False).collect()
        n_keys = sum(1 for r in rows if r[3] == "FormKey")
        # exactly one output row per key
        assert len(out) == n_keys
        assert len({r["key_box_id"] for r in out}) == n_keys
        # one value binds at most one key
        vals = [r["value_box_id"] for r in out if r["value_box_id"] is not None]
        assert len(vals) == len(set(vals))
        for r in out:
            if r["value_box_id"] is None:
                assert r["gap"] is None and r["confidence"] is None
            else:
                # gap is non-negative and bounded by max_gap
                assert 0 <= r["gap"] <= 200
                assert 0 < r["confidence"] <= 1.0
                assert r["relation"] in ("inline", "below")
