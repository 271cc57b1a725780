"""CI-style run of the fern-parity protocol (scripts/verify_fern.py) on the
generated on-disk LLFF fixture: stage-1 -> stage-2 -> eval in one command,
asserting the summary-table print contract (the reference's quality loop,
``run_S_eS_eN_alter_base.py:360-371``)."""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "verify_fern", REPO / "scripts/verify_fern.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_verify_fern_fixture_protocol(tmp_path, capsys):
    vf = _load_script()
    vf.main(["--fixture", "--basedir", str(tmp_path),
             "--s1-steps", "2", "--s2-steps", "2"])
    out = capsys.readouterr().out
    assert "verify_fern summary" in out
    assert "Mean Test PSNR" in out
    assert "held-out PSNR" in out
    # machine-readable trailer
    line = [ln for ln in out.splitlines() if ln.startswith('{"verify_fern"')]
    assert line
    payload = json.loads(line[-1])["verify_fern"]
    assert payload["fixture"] is True
    assert payload["psnr"] == payload["psnr"]  # finite, not NaN


def test_verify_fern_missing_data_message(tmp_path):
    vf = _load_script()
    try:
        vf.main(["--datadir", str(tmp_path / "nope"),
                 "--basedir", str(tmp_path)])
    except SystemExit as e:
        assert "poses_bounds.npy" in str(e)
    else:
        raise AssertionError("expected SystemExit on missing capture")
