"""Compound-split BLEU eval step (reference
``fairseq/scripts/compound_split_bleu.sh`` + ``main.sh:176``)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "compound_split_bleu.sh")


def _write_gen_out(path, pairs):
    lines = []
    for i, (hyp, ref) in enumerate(pairs):
        lines.append(f"S-{i}\tsource {i}")
        lines.append(f"T-{i}\t{ref}")
        lines.append(f"H-{i}\t-0.5\t{hyp}")
    lines.append("Generate test with beam=4: BLEU4 = 0.00")
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def _run(gen):
    return subprocess.run(
        ["bash", SCRIPT, str(gen)], capture_output=True, text=True,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
    )


def test_perfect_hypotheses_score_100(tmp_path):
    gen = tmp_path / "gen.out"
    _write_gen_out(gen, [("the quick-brown fox", "the quick-brown fox"),
                         ("jumps over the dog", "jumps over the dog")])
    r = _run(gen)
    assert r.returncode == 0, r.stderr
    assert "BLEU4 = 100.00" in r.stdout
    # hyphen compounds were split into ##AT##-##AT## tokens before scoring
    sys_text = (tmp_path / "gen.out.sys").read_text()
    assert "quick ##AT##-##AT## brown" in sys_text


def test_compound_split_affects_score(tmp_path):
    # hyp differs from ref ONLY inside a hyphen compound: after splitting,
    # the shared tokens ("well", "##AT##-##AT##", "known") partially match,
    # so BLEU must be strictly between 0 and 100
    gen = tmp_path / "gen.out"
    _write_gen_out(gen, [
        ("a well-known result holds here today",
         "a well-nown result holds here today")])
    r = _run(gen)
    assert r.returncode == 0, r.stderr
    line = [ln for ln in r.stdout.splitlines() if "BLEU4" in ln][-1]
    score = float(line.split("BLEU4 = ")[1].split(",")[0])
    assert 0.0 < score < 100.0


def test_incomplete_generation_detected(tmp_path):
    gen = tmp_path / "gen.out"
    gen.write_text("H-0\t-0.5\tpartial output\n", encoding="utf-8")
    r = _run(gen)
    assert "not done generating" in r.stdout


def test_score_cli_direct(tmp_path):
    """cli.score on plain files (fairseq_cli/score.py equivalent)."""
    sysf, reff = tmp_path / "sys.txt", tmp_path / "ref.txt"
    sysf.write_text("the cat sat on the mat\n", encoding="utf-8")
    reff.write_text("the cat sat on the mat\n", encoding="utf-8")
    r = subprocess.run(
        [sys.executable, "-m", "efficient_attention_tpu.cli.score",
         "--sys", str(sysf), "--ref", str(reff)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr
    assert "BLEU4 = 100.00" in r.stdout
