"""Auxiliary utilities: model path resolution, progress bars, env flags."""

import json
import os
import time

import numpy as np
import pytest

from vllm_rs_tpu.utils.download import ModelPaths, resolve_model
from vllm_rs_tpu.utils.progress import ProgressBar


def test_resolve_local_safetensors_dir(tmp_path):
    (tmp_path / "model-00001-of-00002.safetensors").write_bytes(b"x")
    (tmp_path / "model-00002-of-00002.safetensors").write_bytes(b"x")
    (tmp_path / "config.json").write_text("{}")
    (tmp_path / "tokenizer.json").write_text("{}")
    mp = resolve_model(str(tmp_path))
    assert len(mp.weight_files) == 2 and not mp.is_gguf
    assert mp.config and mp.tokenizer and mp.generation_config is None


def test_resolve_gguf_with_mmproj(tmp_path):
    (tmp_path / "model-q4.gguf").write_bytes(b"x")
    (tmp_path / "mmproj-model.gguf").write_bytes(b"x")
    mp = resolve_model(str(tmp_path))
    assert mp.is_gguf and mp.weight_files[0].endswith("model-q4.gguf")
    assert mp.mmproj and "mmproj" in mp.mmproj


def test_resolve_gguf_file_path(tmp_path):
    p = tmp_path / "m.gguf"
    p.write_bytes(b"x")
    mp = resolve_model(str(p))
    assert mp.is_gguf and mp.weight_files == [str(p)]


def test_resolve_remote_raises_without_network():
    with pytest.raises(RuntimeError, match="download|pre-stage|network"):
        resolve_model("definitely-not/a-local-path-model")


def test_progress_bar_silent_when_not_tty(capsys):
    with ProgressBar(10, "load") as pb:
        for _ in range(10):
            pb.step()
    # pytest captures stderr through a non-tty → no output
    assert capsys.readouterr().err == ""


def test_tool_buffer_timeout_flushes(monkeypatch):
    import vllm_rs_tpu.server.tool_parser as tp

    parser = tp.StreamParser(tp.ToolConfig())
    events = parser.push("<tool_call>{\"name\": ")
    assert events == []  # buffering the tool body
    assert parser.state == parser.TOOL
    monkeypatch.setattr(tp, "_TOOL_BUFFER_TIMEOUT", 0.01)
    time.sleep(0.02)
    events = parser.push("still no end marker")
    kinds = [k for k, _ in events]
    assert all(k == "content" for k in kinds)  # flushed raw, stream unblocked
    assert "".join(p for _, p in events) == '<tool_call>{"name": still no end marker'
    assert parser.state == parser.NORMAL


class TestGenerationDefaults:
    def test_defaults_apply_to_unset_knobs(self):
        from vllm_rs_tpu.server.protocol import sampling_from_openai

        gd = {"temperature": 0.6, "top_p": 0.95, "top_k": 20}
        sp = sampling_from_openai({}, gen_defaults=gd)
        assert sp.temperature == 0.6
        assert sp.top_p == 0.95
        assert sp.top_k == 20

    def test_request_overrides_defaults(self):
        from vllm_rs_tpu.server.protocol import sampling_from_openai

        gd = {"temperature": 0.6}
        sp = sampling_from_openai({"temperature": 0.0}, gen_defaults=gd)
        assert sp.temperature == 0.0

    def test_no_defaults_fallback(self):
        from vllm_rs_tpu.server.protocol import sampling_from_openai

        sp = sampling_from_openai({})
        assert sp.temperature == 1.0
