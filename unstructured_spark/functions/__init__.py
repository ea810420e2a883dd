"""Scalar column-function library (the engine's WHERE/CASE/cleaner surface).

Everything here returns pyspark Column expressions built from JVM-side
built-ins so the classifier/cleaner path stays inside whole-stage
codegen — no Python in the hot loop (reference implements these as
row-at-a-time Python string functions; SURVEY §2.2/§2.3).
"""
