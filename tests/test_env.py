"""`.env` loading parity (reference: generate_report_gemini.py:31-42 and
RAG_Assistant/rag_assistant.py:35-39 load GEMINI_API_KEY from a repo-root
.env via python-dotenv)."""

import os

from braintpu.utils.env import load_dotenv, parse_dotenv


def test_parse_dotenv_common_subset():
    text = "\n".join([
        "# comment",
        "",
        "GEMINI_API_KEY=abc123",
        "export EXPORTED=yes",
        'DQ="double quoted"',
        "SQ='single quoted'",
        "SPACED = padded value ",
        "INLINE=value # trailing comment",
        "HASHVAL=a#b",          # '#' without preceding space is kept
        "not a kv line",
        "=novalue",
        "BAD KEY=x",
    ])
    parsed = parse_dotenv(text)
    assert parsed == {
        "GEMINI_API_KEY": "abc123",
        "EXPORTED": "yes",
        "DQ": "double quoted",
        "SQ": "single quoted",
        "SPACED": "padded value",
        "INLINE": "value",
        "HASHVAL": "a#b",
    }


def test_load_dotenv_no_override(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("A_NEW_VAR=fresh\nPRESET=from_file\n")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("PRESET", "from_process")
    monkeypatch.delenv("A_NEW_VAR", raising=False)
    applied = load_dotenv()
    assert applied == {"A_NEW_VAR": "fresh"}
    assert os.environ["A_NEW_VAR"] == "fresh"
    assert os.environ["PRESET"] == "from_process"  # process env wins


def test_load_dotenv_searches_parents(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("PARENT_VAR=seen\n")
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    monkeypatch.chdir(sub)
    monkeypatch.delenv("PARENT_VAR", raising=False)
    assert load_dotenv() == {"PARENT_VAR": "seen"}


def test_load_dotenv_missing_is_noop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # guard: no .env anywhere up the tmp tree
    assert load_dotenv(tmp_path / ".env") == {}


def test_gemini_client_reads_dotenv(tmp_path, monkeypatch):
    from braintpu.report.llm import GeminiClient

    (tmp_path / ".env").write_text("GEMINI_API_KEY=dotenv-key\n")
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    client = GeminiClient()
    assert client.api_key == "dotenv-key"
    assert client.available


def test_parse_dotenv_quoted_value_with_inline_comment():
    from braintpu.utils.env import parse_dotenv

    # python-dotenv semantics: quotes never leak into the value
    assert parse_dotenv('KEY="abc123" # prod key') == {"KEY": "abc123"}
    assert parse_dotenv("KEY='abc123' # prod key") == {"KEY": "abc123"}
    assert parse_dotenv('KEY="with # inside"') == {"KEY": "with # inside"}


def test_load_dotenv_skips_unreadable_candidate(tmp_path, monkeypatch):
    import os
    from braintpu.utils.env import load_dotenv

    parent = tmp_path
    child = tmp_path / "sub"
    child.mkdir()
    (parent / ".env").write_text("ENVTEST_PARENT_KEY=fromparent\n")
    bad = child / ".env"
    bad.write_text("ENVTEST_CHILD_KEY=unreachable\n")
    bad.chmod(0)
    monkeypatch.chdir(child)
    monkeypatch.delenv("ENVTEST_PARENT_KEY", raising=False)
    try:
        if os.access(bad, os.R_OK):  # running as root: chmod 0 not enforced
            import pytest
            pytest.skip("cannot make file unreadable under this uid")
        applied = load_dotenv()
    finally:
        bad.chmod(0o644)
    assert applied.get("ENVTEST_PARENT_KEY") == "fromparent"
