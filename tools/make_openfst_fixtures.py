"""Regenerate tests/fixtures/golden_*.fst (OpenFst binary golden bytes).

Run from the repo root: python tools/make_openfst_fixtures.py
The fixture contents must stay in sync with tests/test_openfst_binary.py's
small_raw(); the committed bytes pin the writer's output so format drift
between rounds is caught."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tests.test_openfst_binary import small_raw  # noqa: E402
from torchain_tpu.fstkit.openfst_io import write_openfst_raw  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def main():
    specs = [
        ("golden_vector_standard.fst", "standard", "vector", False),
        ("golden_const_aligned.fst", "standard", "const", True),
        ("golden_compactlattice44.fst", "compactlattice44", "vector", False),
    ]
    for name, arctype, fsttype, aligned in specs:
        path = FIXTURES / name
        write_openfst_raw(str(path), small_raw(arctype), fsttype=fsttype, aligned=aligned)
        print(f"wrote {path} ({path.stat().st_size} bytes)")




def make_cegs_fixture():
    from tests.test_cegs import _golden_example
    from torchain_tpu.data.cegs import write_cegs_ark

    path = FIXTURES / "golden_cegs.ark"
    write_cegs_ark(str(path), {"eg-golden": _golden_example()})
    print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
    make_cegs_fixture()
