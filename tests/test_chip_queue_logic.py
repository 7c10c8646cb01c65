"""scripts/queue_lib.sh: the chip queue's unattended row mechanics.

The queue runs with no session alive (fired by the relay probe loop); a bug
in its skip/re-arm/lock logic silently wastes the relay window. Exercise the
sourceable lib with stub commands: done-marker skip, relay-down re-arm,
timeout-vs-deterministic-failure marking, and preserve's summarize+copy.
"""
import os
import subprocess
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queue(tmp_path, body, probe="true"):
    """Run a minimal queue script sourcing queue_lib.sh with stubbed env."""
    logdir = tmp_path / "logs"
    fired = tmp_path / "queue_fired"
    fired.write_text("")
    script = tmp_path / "q.sh"
    script.write_text(textwrap.dedent(f"""\
        #!/bin/bash
        cd {REPO}
        export QUEUE_LOG_DIR={logdir}
        export QUEUE_FIRED_FLAG={fired}
        export QUEUE_CHIP_LOCK={tmp_path}/chip.lock
        export QUEUE_PROBE_CMD={probe}
        export QUEUE_REPO={tmp_path}/norepo
        export QUEUE_LOCK_WAIT=5
        source scripts/queue_lib.sh
        """) + textwrap.dedent(body))
    proc = subprocess.run(["bash", str(script)], capture_output=True,
                          text=True, timeout=120)
    return proc, logdir, fired


def test_row_runs_and_marks_done(tmp_path):
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'echo hello-row'
        """)
    assert proc.returncode == 0
    assert (logdir / "done" / "rowa").read_text().strip() == "rc=0"
    assert "hello-row" in (logdir / "rowa.log").read_text()
    assert fired.exists()  # relay up: guard stays armed


def test_done_row_skipped_on_refire(tmp_path):
    body = """
        run rowa bash -c 'echo ran >> %s/count'
        """ % tmp_path
    _queue(tmp_path, body)
    proc, logdir, _ = _queue(tmp_path, body)
    # second fire: the done-marker from the first must skip the row
    assert (tmp_path / "count").read_text().count("ran") == 1
    assert "skip (done)" in (logdir / "queue.log").read_text()


def test_relay_down_rearm_before_row(tmp_path):
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'echo should-not-run'
        """, probe="false")
    assert proc.returncode == 1
    assert not fired.exists()  # re-armed: probe loop resumes watching
    assert not (logdir / "done" / "rowa").exists()
    assert "re-arming" in (logdir / "queue.log").read_text()


def test_deterministic_failure_still_marked_done(tmp_path):
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'echo boom; exit 3'
        run rowb bash -c 'echo next-runs'
        """)
    assert proc.returncode == 0
    assert (logdir / "done" / "rowa").read_text().strip() == "rc=3"
    assert "next-runs" in (logdir / "rowb.log").read_text()


def test_timeout_with_relay_up_marks_done(tmp_path):
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'exit 124'
        """)
    assert proc.returncode == 0
    assert "timeout-or-unavailable" in (logdir / "done" / "rowa").read_text()
    assert fired.exists()


def test_timeout_with_relay_down_rearms(tmp_path):
    # probe succeeds before the row, fails after (relay died mid-row):
    # first call removes the sentinel, second call finds it gone and fails
    sentinel = tmp_path / "relay_up"
    sentinel.write_text("")
    probe = f"'rm {sentinel}'"
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'exit 124'
        """, probe=probe)
    assert proc.returncode == 1
    assert not (logdir / "done" / "rowa").exists()  # row will retry
    assert not fired.exists()


def test_unavailable_error_line_with_relay_down_rearms(tmp_path):
    sentinel = tmp_path / "relay_up"
    sentinel.write_text("")
    probe = f"'rm {sentinel}'"
    proc, logdir, fired = _queue(tmp_path, """
        run rowa bash -c 'echo "{\\"error\\": \\"TPU backend unavailable after retries\\"}"; exit 1'
        """, probe=probe)
    assert proc.returncode == 1
    assert not (logdir / "done" / "rowa").exists()
    assert not fired.exists()


def test_preserve_copies_and_summarizes(tmp_path):
    repo = tmp_path / "repo"
    (repo / "docs").mkdir(parents=True)
    subprocess.run(["git", "init", "-q", str(repo)], check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.email", "t@t"],
                   check=True)
    subprocess.run(["git", "-C", str(repo), "config", "user.name", "t"],
                   check=True)
    # preserve cd's into QUEUE_REPO to run the summarizer, so the script must
    # be reachable there
    (repo / "scripts").mkdir()
    src = os.path.join(REPO, "scripts", "summarize_chip_logs.py")
    (repo / "scripts" / "summarize_chip_logs.py").write_text(
        open(src).read())
    logdir = tmp_path / "logs"
    script = tmp_path / "q.sh"
    script.write_text(textwrap.dedent(f"""\
        #!/bin/bash
        cd {REPO}
        export QUEUE_LOG_DIR={logdir}
        export QUEUE_FIRED_FLAG={tmp_path}/queue_fired
        export QUEUE_CHIP_LOCK={tmp_path}/chip.lock
        export QUEUE_PROBE_CMD=true
        export QUEUE_REPO={repo}
        source scripts/queue_lib.sh
        run rowa bash -c 'echo "{{\\"metric\\": \\"m\\", \\"value\\": 1.5}}"'
        preserve
        """))
    proc = subprocess.run(["bash", str(script)], capture_output=True,
                          text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    dest = repo / "docs" / "data" / "r4_chip"
    assert (dest / "rowa.log").exists()
    assert (dest / "SUMMARY.md").exists()
    assert "1.5" in (dest / "SUMMARY.md").read_text()
    log = subprocess.run(["git", "-C", str(repo), "log", "--oneline"],
                         capture_output=True, text=True)
    assert "Capture r4 chip-queue logs" in log.stdout
