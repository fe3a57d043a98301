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
