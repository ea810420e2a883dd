"""``python -m unstructured_spark <command>`` — reference cli.py shape:
currently the ``doctor`` capability diagnostics."""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "doctor":
        from unstructured_spark.doctor import main as doctor_main

        return doctor_main(argv[1:])
    prog = "python -m unstructured_spark"
    if not argv or argv[0] in ("-h", "--help"):
        print(f"usage: {prog} doctor [--for TYPE | --file PATH]")
        return 0
    print(f"unknown command: {argv[0]!r}; try '{prog} doctor'", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
