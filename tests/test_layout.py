"""XY-cut reading order (reference utils/xycut.py semantics)."""

from unstructured_spark.parsers.layout import basic_order, xy_cut_order


class TestXyCut:
    def test_single_column_top_down(self):
        boxes = [(0, 100, 50, 110), (0, 10, 50, 20), (0, 50, 50, 60)]
        assert xy_cut_order(boxes) == [1, 2, 0]

    def test_two_columns_left_first(self):
        # vertically continuous columns (no full-width horizontal
        # valley) → the vertical cut wins and the left column is read
        # fully before the right one
        boxes = [
            (300, 10, 400, 22),   # right top
            (0, 12, 100, 24),     # left top
            (300, 20, 400, 32),   # right bottom
            (0, 22, 100, 34),     # left bottom
        ]
        assert xy_cut_order(boxes) == [1, 3, 0, 2]

    def test_banded_layout_reads_bands_top_down(self):
        # a full-width whitespace band separates two row-bands: the
        # horizontal cut precedes any column cut
        boxes = [
            (300, 10, 400, 20),   # band-1 right
            (0, 12, 100, 22),     # band-1 left
            (300, 40, 400, 50),   # band-2 right
            (0, 42, 100, 52),     # band-2 left
        ]
        assert xy_cut_order(boxes) == [1, 0, 3, 2]

    def test_full_width_header_then_columns(self):
        boxes = [
            (0, 0, 400, 20),      # banner spans both columns
            (300, 40, 400, 50),   # right
            (0, 42, 100, 52),     # left
        ]
        assert xy_cut_order(boxes) == [0, 2, 1]

    def test_basic_order_is_y_then_x(self):
        boxes = [(50, 10, 60, 20), (0, 10, 10, 20), (0, 5, 10, 8)]
        assert basic_order(boxes) == [2, 1, 0]
