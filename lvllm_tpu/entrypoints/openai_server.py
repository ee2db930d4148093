"""OpenAI-compatible HTTP server.

Counterpart of the reference's ``vllm/entrypoints/openai/api_server.py``
(FastAPI app with /v1/completions, /v1/chat/completions, /v1/models,
streaming SSE, /health, /metrics). Built on aiohttp (no fastapi in the
image); the protocol schemas match the OpenAI wire format the reference
serves.
"""

import argparse
import asyncio
import json
import os
import time
import uuid
from typing import Any, Dict, List, Optional

from aiohttp import web

from lvllm_tpu.config import EngineConfig
from lvllm_tpu.engine.async_llm import AsyncLLM
from lvllm_tpu.logger import init_logger
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


def _guided_from_request(body: Dict[str, Any]) -> Dict[str, Any]:
    """Structured-output fields: OpenAI ``response_format`` plus the
    vLLM-compatible guided_* extras (reference:
    entrypoints/openai/protocol.py StructuredOutputsParams)."""
    out: Dict[str, Any] = {}
    rf = body.get("response_format") or {}
    if rf.get("type") == "json_object":
        out["guided_json"] = "{}"  # JSON mode: any JSON object
    elif rf.get("type") == "json_schema":
        schema = (rf.get("json_schema") or {}).get("schema")
        out["guided_json"] = schema if schema is not None else "{}"
    for key in ("guided_json", "guided_regex", "guided_choice",
                "guided_grammar"):
        val = body.get(key, (body.get("extra_body") or {}).get(key))
        if val is not None:
            out[key] = val
    return out


def sampling_params_from_request(body: Dict[str, Any]) -> SamplingParams:
    return SamplingParams(
        **_guided_from_request(body),
        n=body.get("n", 1),
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0),
        top_k=body.get("top_k", 0),
        min_p=body.get("min_p", 0.0),
        max_tokens=body.get("max_tokens", body.get("max_completion_tokens",
                                                   16)),
        presence_penalty=body.get("presence_penalty", 0.0),
        frequency_penalty=body.get("frequency_penalty", 0.0),
        repetition_penalty=body.get("repetition_penalty", 1.0),
        stop=body.get("stop"),
        seed=body.get("seed"),
        logprobs=(body.get("logprobs") if isinstance(body.get("logprobs"),
                                                     int) else None),
        ignore_eos=body.get("ignore_eos", False),
    )


class OpenAIServer:

    def __init__(self, async_llm: AsyncLLM, model_name: str = "lvllm-model",
                 tool_parser: str = "hermes",
                 enable_reasoning: bool = True,
                 reasoning_parser: str = "basic"):
        from lvllm_tpu.reasoning import get_reasoning_parser
        from lvllm_tpu.tool_parsers import get_tool_parser
        self.llm = async_llm
        self.model_name = model_name
        self.start_time = time.time()
        self.tool_parser = get_tool_parser(tool_parser) if tool_parser \
            else None
        self.reasoning_parser = get_reasoning_parser(reasoning_parser) \
            if enable_reasoning else None
        self.app = web.Application()
        self.app.router.add_get("/health", self.health)
        self.app.router.add_get("/v1/models", self.models)
        self.app.router.add_post("/v1/completions", self.completions)
        self.app.router.add_post("/v1/chat/completions",
                                 self.chat_completions)
        self.app.router.add_post("/v1/responses", self.responses)
        self.app.router.add_post("/v1/embeddings", self.embeddings)
        self.app.router.add_post("/pooling", self.pooling)
        self.app.router.add_post("/v1/pooling", self.pooling)
        # Audio (Whisper): OpenAI-compatible speech-to-text (reference:
        # entrypoints/openai/serving_transcription.py).
        self.app.router.add_post("/v1/audio/transcriptions",
                                 self.transcriptions)
        self.app.router.add_post("/v1/audio/translations",
                                 self.translations)
        self.app.router.add_get("/v1/realtime", self.realtime)
        self.app.router.add_post("/tokenize", self.tokenize)
        self.app.router.add_post("/detokenize", self.detokenize)
        self.app.router.add_get("/metrics", self.metrics)
        # Ops endpoints (reference: entrypoints/serve/sleep, serve/profile).
        self.app.router.add_post("/sleep", self.sleep)
        self.app.router.add_post("/wake_up", self.wake_up)
        self.app.router.add_get("/is_sleeping", self.is_sleeping)
        self.app.router.add_post("/v1/messages", self.anthropic_messages)
        self.app.router.add_post("/v1/score", self.score)
        self.app.router.add_post("/v1/rerank", self.rerank)
        self.app.router.add_post("/reload_weights", self.reload_weights)
        self.app.router.add_post("/v1/load_lora_adapter",
                                 self.load_lora_adapter)
        self.app.router.add_post("/v1/unload_lora_adapter",
                                 self.unload_lora_adapter)
        self.app.router.add_post("/start_profile", self.start_profile)
        self.app.router.add_post("/stop_profile", self.stop_profile)
        self._profiling = False

    # ---- endpoints ---------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{
                "id": self.model_name,
                "object": "model",
                "created": int(self.start_time),
                "owned_by": "lvllm_tpu",
                "max_model_len": self.llm.config.model_config.max_model_len,
            }],
        })

    async def embeddings(self, request: web.Request) -> web.Response:
        """OpenAI embeddings API over the pooling runner."""
        from lvllm_tpu.engine.pooling import PoolingRunner
        body = await request.json()
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        tok = self.llm.tokenizer
        if tok is None:
            return self._error("no tokenizer loaded", 400)
        token_lists = [tok.encode(t) if isinstance(t, str) else list(t)
                       for t in inputs]
        if not hasattr(self, "_pooling_runner"):
            self._pooling_runner = PoolingRunner(
                self.llm.core.model, self.llm.core.runner.params,
                block_size=self.llm.config.cache_config.block_size)
        loop = asyncio.get_running_loop()
        embs = await loop.run_in_executor(
            None, lambda: self._pooling_runner.embed(token_lists))
        return web.json_response({
            "object": "list", "model": self.model_name,
            "data": [{"object": "embedding", "index": i,
                      "embedding": e.tolist()}
                     for i, e in enumerate(embs)],
            "usage": {"prompt_tokens": sum(len(t) for t in token_lists),
                      "total_tokens": sum(len(t) for t in token_lists)},
        })

    async def pooling(self, request: web.Request) -> web.Response:
        """Task-agnostic pooling API (reference: /pooling route,
        entrypoints/openai/serving_pooling.py): returns raw pooled
        vectors — classifier logits for classification heads, hidden
        pools otherwise."""
        from lvllm_tpu.engine.pooling import PoolingRunner
        body = await request.json()
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        tok = self.llm.tokenizer
        if tok is None:
            return self._error("no tokenizer loaded", 400)
        token_lists = [tok.encode(t) if isinstance(t, str) else list(t)
                       for t in inputs]
        if not hasattr(self, "_pooling_runner"):
            self._pooling_runner = PoolingRunner(
                self.llm.core.model, self.llm.core.runner.params,
                block_size=self.llm.config.cache_config.block_size)
        loop = asyncio.get_running_loop()
        if self._is_cross_encoder():
            outs = await loop.run_in_executor(
                None, lambda: self._pooling_runner.classify(token_lists))
        else:
            task = body.get("task", "embed")
            pool = {"embed": "auto", "cls": "cls",
                    "mean": "mean", "last": "last"}.get(task, "auto")
            outs = await loop.run_in_executor(
                None,
                lambda: self._pooling_runner.embed(token_lists,
                                                   pooling=pool))
        return web.json_response({
            "object": "list", "model": self.model_name,
            "data": [{"object": "pooling", "index": i,
                      "data": (o.tolist() if hasattr(o, "tolist")
                               else list(o))}
                     for i, o in enumerate(outs)],
            "usage": {"prompt_tokens": sum(len(t) for t in token_lists),
                      "total_tokens": sum(len(t) for t in token_lists)},
        })

    # ---- audio (Whisper) --------------------------------------------------

    def _audio_features(self, wav: "np.ndarray", sample_rate: int):
        """Waveform → log-mel input_features via the HF feature extractor
        (resampled to 16 kHz by linear interpolation when needed)."""
        import numpy as np
        if sample_rate != 16000:
            n = int(len(wav) * 16000 / sample_rate)
            wav = np.interp(np.linspace(0, len(wav) - 1, n),
                            np.arange(len(wav)), wav)
        if not hasattr(self, "_feature_extractor"):
            from transformers import WhisperFeatureExtractor
            mc = self.llm.config.model_config
            try:
                self._feature_extractor = \
                    WhisperFeatureExtractor.from_pretrained(mc.model)
            except Exception:  # noqa: BLE001
                self._feature_extractor = WhisperFeatureExtractor(
                    feature_size=(mc.vision_config or {}).get(
                        "num_mel_bins", 80))
        out = self._feature_extractor(wav, sampling_rate=16000,
                                      return_tensors="np")
        return out["input_features"]          # [1, M, T]

    def _whisper_prompt(self, language: str, task: str):
        """Forced decoder ids: <|startoftranscript|><|lang|><|task|>
        <|notimestamps|> (HF WhisperTokenizer convention)."""
        mc = self.llm.config.model_config
        tok = self.llm.tokenizer
        start = (mc.vision_config or {}).get("decoder_start_token_id",
                                             50258)
        ids = [start]
        if tok is not None and hasattr(tok, "convert_tokens_to_ids"):
            unk = getattr(tok, "unk_token_id", None)
            for t in (f"<|{language}|>", f"<|{task}|>", "<|notimestamps|>"):
                tid = tok.convert_tokens_to_ids(t)
                if tid is not None and tid != unk:
                    ids.append(tid)
        return ids

    async def _audio_endpoint(self, request: web.Request, task: str
                              ) -> web.Response:
        import numpy as np
        feats = None
        language = "en"
        temperature = 0.0
        prompt_ids = None
        max_tokens = 220
        if request.content_type.startswith("multipart/"):
            reader = await request.multipart()
            async for part in reader:
                if part.name == "file":
                    raw = await part.read()
                    import io
                    import wave as wave_mod
                    with wave_mod.open(io.BytesIO(raw)) as wf:
                        sr = wf.getframerate()
                        n = wf.getnframes()
                        data = np.frombuffer(wf.readframes(n), np.int16)
                        if wf.getnchannels() > 1:
                            data = data.reshape(
                                -1, wf.getnchannels()).mean(axis=1)
                    feats = self._audio_features(
                        data.astype(np.float32) / 32768.0, sr)
                elif part.name == "language":
                    language = (await part.text()).strip()
                elif part.name == "temperature":
                    temperature = float(await part.text())
        else:
            body = await request.json()
            language = body.get("language", "en")
            temperature = float(body.get("temperature", 0.0))
            max_tokens = int(body.get("max_tokens", max_tokens))
            prompt_ids = body.get("prompt_ids")
            if body.get("input_features") is not None:
                feats = np.asarray(body["input_features"], np.float32)
            elif body.get("waveform") is not None:
                feats = self._audio_features(
                    np.asarray(body["waveform"], np.float32),
                    int(body.get("sample_rate", 16000)))
        if feats is None:
            return self._error("no audio provided", 400)
        if prompt_ids is None:
            prompt_ids = self._whisper_prompt(language, task)
        sp = SamplingParams(temperature=temperature, max_tokens=max_tokens)
        final = None
        async for out in self.llm.generate(
                list(prompt_ids), sp,
                mm_data={"input_features": feats}):
            if out.finished:
                final = out
        ids = final.outputs[0].token_ids
        tok = self.llm.tokenizer
        text = (tok.decode(ids, skip_special_tokens=True)
                if tok is not None else "")
        return web.json_response({"text": text, "token_ids": list(ids)})

    async def realtime(self, request: web.Request) -> web.WebSocketResponse:
        """OpenAI Realtime API (subset) over WebSocket (reference:
        entrypoints/openai serving realtime): session.update /
        conversation.item.create / input_audio_buffer.append+commit /
        response.create with streamed response.text.delta events."""
        import base64
        import uuid as _uuid

        import numpy as np

        ws = web.WebSocketResponse()
        await ws.prepare(request)
        session_id = f"sess_{_uuid.uuid4().hex[:12]}"
        await ws.send_json({"type": "session.created",
                            "session": {"id": session_id,
                                        "model": self.model_name}})
        items: List[Dict[str, Any]] = []
        audio_buf = bytearray()
        session_cfg: Dict[str, Any] = {}
        tok = self.llm.tokenizer
        async for msg in ws:
            if msg.type != web.WSMsgType.TEXT:
                break
            try:
                ev = json.loads(msg.data)
            except ValueError:
                await ws.send_json({"type": "error",
                                    "error": {"message": "bad json"}})
                continue
            kind = ev.get("type")
            if kind == "session.update":
                session_cfg.update(ev.get("session") or {})
                await ws.send_json({"type": "session.updated",
                                    "session": {"id": session_id,
                                                **session_cfg}})
            elif kind == "conversation.item.create":
                item = ev.get("item") or {}
                item.setdefault("id", f"item_{_uuid.uuid4().hex[:10]}")
                items.append(item)
                await ws.send_json({"type": "conversation.item.created",
                                    "item": item})
            elif kind == "input_audio_buffer.append":
                audio_buf.extend(base64.b64decode(ev.get("audio", "")))
                await ws.send_json({"type": "input_audio_buffer.appended"})
            elif kind == "input_audio_buffer.commit":
                pcm = np.frombuffer(bytes(audio_buf), np.int16)
                audio_buf.clear()
                text = ""
                if len(pcm) and getattr(
                        self.llm.engine.core.runner, "is_enc_dec", False):
                    feats = self._audio_features(
                        pcm.astype(np.float32) / 32768.0,
                        int(ev.get("sample_rate", 16000)))
                    sp = SamplingParams(temperature=0.0, max_tokens=220)
                    final = None
                    async for out in self.llm.generate(
                            self._whisper_prompt(
                                ev.get("language", "en"), "transcribe"),
                            sp, mm_data={"input_features": feats}):
                        if out.finished:
                            final = out
                    ids = final.outputs[0].token_ids
                    text = (tok.decode(ids, skip_special_tokens=True)
                            if tok else "")
                    items.append({"type": "message", "role": "user",
                                  "content": [{"type": "input_text",
                                               "text": text}]})
                await ws.send_json(
                    {"type": "conversation.item."
                             "input_audio_transcription.completed",
                     "transcript": text})
            elif kind == "response.create":
                if tok is None:
                    await ws.send_json({"type": "error", "error": {
                        "message": "no tokenizer loaded"}})
                    continue
                prompt = ""
                for it in items:
                    for c in it.get("content") or []:
                        if c.get("type") in ("input_text", "text"):
                            prompt += c.get("text", "") + "\n"
                rcfg = ev.get("response") or {}
                sp = SamplingParams(
                    temperature=rcfg.get("temperature", 0.8),
                    max_tokens=rcfg.get("max_output_tokens", 128))
                resp_id = f"resp_{_uuid.uuid4().hex[:10]}"
                await ws.send_json({"type": "response.created",
                                    "response": {"id": resp_id}})
                sent = 0
                final = None
                async for out in self.llm.generate(
                        tok.encode(prompt) if prompt else [1], sp):
                    text = out.outputs[0].text
                    if len(text) > sent:
                        await ws.send_json({"type": "response.text.delta",
                                            "response_id": resp_id,
                                            "delta": text[sent:]})
                        sent = len(text)
                    if out.finished:
                        final = out
                full = final.outputs[0].text if final else ""
                items.append({"type": "message", "role": "assistant",
                              "content": [{"type": "text", "text": full}]})
                await ws.send_json({"type": "response.text.done",
                                    "response_id": resp_id, "text": full})
                await ws.send_json({
                    "type": "response.done",
                    "response": {"id": resp_id, "status": "completed",
                                 "output": [{"type": "message",
                                             "content": [{"type": "text",
                                                          "text": full}]}]}
                })
            elif kind == "session.close":
                break
            else:
                await ws.send_json({"type": "error", "error": {
                    "message": f"unsupported event {kind}"}})
        await ws.close()
        return ws

    async def transcriptions(self, request: web.Request) -> web.Response:
        return await self._audio_endpoint(request, "transcribe")

    async def translations(self, request: web.Request) -> web.Response:
        return await self._audio_endpoint(request, "translate")

    async def tokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        tok = self.llm.tokenizer
        if tok is None:
            return web.json_response({"error": "no tokenizer"}, status=400)
        ids = tok.encode(body["prompt"])
        return web.json_response({"tokens": ids, "count": len(ids),
                                  "max_model_len":
                                  self.llm.config.model_config.max_model_len})

    async def detokenize(self, request: web.Request) -> web.Response:
        body = await request.json()
        tok = self.llm.tokenizer
        if tok is None:
            return web.json_response({"error": "no tokenizer"}, status=400)
        return web.json_response({"prompt": tok.decode(body["tokens"])})

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus text exposition, vllm:*-compatible metric names."""
        s = self.llm.get_stats()
        pc = s.get("prefix_cache", {})
        lines = [
            "# TYPE vllm:num_requests_running gauge",
            f"vllm:num_requests_running {s['num_running']}",
            "# TYPE vllm:num_requests_waiting gauge",
            f"vllm:num_requests_waiting {s['num_waiting']}",
            "# TYPE vllm:kv_cache_usage_perc gauge",
            f"vllm:kv_cache_usage_perc {s['kv_cache_usage']}",
            "# TYPE vllm:num_preemptions_total counter",
            f"vllm:num_preemptions_total {s['num_preemptions']}",
            "# TYPE vllm:prefix_cache_queries_total counter",
            f"vllm:prefix_cache_queries_total {pc.get('queries', 0)}",
            "# TYPE vllm:prefix_cache_hits_total counter",
            f"vllm:prefix_cache_hits_total {pc.get('hits', 0)}",
        ]
        sd = s.get("spec_decode") or {}
        if sd.get("num_draft_tokens"):
            lines += [
                "# TYPE vllm:spec_decode_num_draft_tokens_total counter",
                f"vllm:spec_decode_num_draft_tokens_total "
                f"{sd['num_draft_tokens']}",
                "# TYPE vllm:spec_decode_num_accepted_tokens_total counter",
                f"vllm:spec_decode_num_accepted_tokens_total "
                f"{sd['num_accepted_tokens']}",
            ]
        lines += self.llm.core.metrics.prometheus_lines()
        # Sleep state + cache-config info gauges (reference:
        # loggers.py:494, :1040).
        sleeping = 0
        try:
            sleeping = int(bool(self.llm.core.is_sleeping()))
        except Exception:  # noqa: BLE001
            pass
        cc = self.llm.config.cache_config
        lines += [
            "# TYPE vllm:engine_sleep_state gauge",
            f"vllm:engine_sleep_state {sleeping}",
            "# TYPE vllm:cache_config_info gauge",
            f'vllm:cache_config_info{{block_size="{cc.block_size}",'
            f'enable_prefix_caching="{cc.enable_prefix_caching}"}} 1',
        ]
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def load_lora_adapter(self, request: web.Request
                                ) -> web.Response:
        """Dynamic adapter load from a PEFT checkpoint dir (reference:
        entrypoints/serve lora load/unload API)."""
        body = await request.json()
        name = body.get("lora_name")
        path = body.get("lora_path")
        lora_int_id = body.get("lora_int_id")
        if not (name and path and lora_int_id):
            return self._error("lora_name, lora_path and lora_int_id "
                               "required", 400)
        from lvllm_tpu.lora.manager import LoRARequest
        try:
            slot = self.llm.core.add_lora(LoRARequest(
                lora_name=name, lora_int_id=int(lora_int_id),
                lora_path=path))
        except (AssertionError, RuntimeError, OSError, ValueError) as e:
            return self._error(str(e), 400)
        return web.json_response({"status": "ok", "slot": slot})

    async def unload_lora_adapter(self, request: web.Request
                                  ) -> web.Response:
        body = await request.json()
        lora_int_id = body.get("lora_int_id")
        if lora_int_id is None:
            return self._error("lora_int_id required", 400)
        ok = self.llm.core.remove_lora(int(lora_int_id))
        return web.json_response({"status": "ok" if ok else "not_found"})

    async def sleep(self, request: web.Request) -> web.Response:
        try:
            level = int(request.query.get("level", "1"))
            self.llm.core.sleep(level)
            return web.json_response({"status": "ok"})
        except RuntimeError as e:
            return self._error(str(e), 409)

    async def wake_up(self, request: web.Request) -> web.Response:
        self.llm.core.wake_up()
        return web.json_response({"status": "ok"})

    async def is_sleeping(self, request: web.Request) -> web.Response:
        return web.json_response({"is_sleeping": self.llm.core.is_sleeping})

    async def anthropic_messages(self, request: web.Request) -> web.Response:
        """Anthropic Messages protocol (reference: entrypoints/anthropic/):
        maps /v1/messages onto the chat pipeline with Anthropic wire
        shapes."""
        try:
            body = await request.json()
            messages = list(body["messages"])
            if body.get("system"):
                sys_content = body["system"]
                if isinstance(sys_content, list):
                    sys_content = "".join(
                        b.get("text", "") for b in sys_content)
                messages.insert(0, {"role": "system",
                                    "content": sys_content})
            # Anthropic content blocks → plain text.
            for m in messages:
                if isinstance(m.get("content"), list):
                    m["content"] = "".join(b.get("text", "")
                                           for b in m["content"])
            prompt = self._apply_chat_template(messages)
            sp = SamplingParams(
                temperature=body.get("temperature", 1.0),
                top_p=body.get("top_p", 1.0),
                top_k=body.get("top_k", 0),
                max_tokens=body.get("max_tokens", 256),
                stop=body.get("stop_sequences"),
            )
        except (ValueError, KeyError, TypeError) as e:
            return web.json_response(
                {"type": "error",
                 "error": {"type": "invalid_request_error",
                           "message": str(e)}}, status=400)
        rid = f"msg_{uuid.uuid4().hex[:24]}"
        try:
            final = None
            async for out in self.llm.generate(prompt, sp, rid):
                final = out
        except ValueError as e:
            return web.json_response(
                {"type": "error",
                 "error": {"type": "invalid_request_error",
                           "message": str(e)}}, status=400)
        c = final.outputs[0]
        content = []
        text = c.text
        if self.reasoning_parser is not None:
            reasoning, text = self.reasoning_parser.extract(c.text)
            if reasoning is not None:
                content.append({"type": "thinking", "thinking": reasoning})
        content.append({"type": "text", "text": text})
        stop_reason = {"stop": "stop_sequence", "length": "max_tokens"}.get(
            c.finish_reason, "end_turn")
        if c.finish_reason == "stop" and c.stop_reason is None:
            stop_reason = "end_turn"
        return web.json_response({
            "id": rid, "type": "message", "role": "assistant",
            "model": body.get("model", self.model_name),
            "content": content,
            "stop_reason": stop_reason,
            "stop_sequence": (c.stop_reason
                              if isinstance(c.stop_reason, str) else None),
            "usage": {
                "input_tokens": len(final.prompt_token_ids),
                "output_tokens": len(c.token_ids),
            },
        })

    async def _embed_texts(self, texts):
        from lvllm_tpu.engine.pooling import PoolingRunner
        tok = self.llm.tokenizer
        token_lists = [tok.encode(t) for t in texts]
        if not hasattr(self, "_pooling_runner"):
            self._pooling_runner = PoolingRunner(
                self.llm.core.model, self.llm.core.runner.params,
                block_size=self.llm.config.cache_config.block_size)
        import asyncio as _aio
        loop = _aio.get_running_loop()
        return await loop.run_in_executor(
            None, lambda: self._pooling_runner.embed(token_lists))

    def _is_cross_encoder(self) -> bool:
        m = self.llm.core.model
        return bool(getattr(m, "is_classifier", False)
                    and not getattr(m, "token_level", False))

    async def _cross_scores(self, query: str, docs) -> list:
        """Cross-encoder scoring (reference: /score and /rerank over
        BertForSequenceClassification-style models): each (query, doc)
        pair runs jointly through the classifier; single-label heads map
        through sigmoid (ms-marco reranker convention)."""
        import math

        tok = self.llm.tokenizer
        token_lists = []
        for d in docs:
            try:
                token_lists.append(tok.encode(query, d))
            except TypeError:   # tokenizer without pair support
                token_lists.append(tok.encode(query) + tok.encode(d))
        if not hasattr(self, "_pooling_runner"):
            from lvllm_tpu.engine.pooling import PoolingRunner
            self._pooling_runner = PoolingRunner(
                self.llm.core.model, self.llm.core.runner.params,
                block_size=self.llm.config.cache_config.block_size)
        import asyncio as _aio
        loop = _aio.get_running_loop()
        logits = await loop.run_in_executor(
            None, lambda: self._pooling_runner.classify(token_lists))
        out = []
        import numpy as np
        for lg in logits:
            if lg.shape[-1] == 1:
                out.append(1.0 / (1.0 + math.exp(-float(lg[0]))))
            else:
                # Multi-label heads (NLI-style cross-encoders): softmax
                # over labels so scores are comparable probabilities; use
                # the model's designated relevance label when known, else
                # the max class probability (ADVICE r04).
                x = lg.astype(np.float64) - float(lg.max())
                probs = np.exp(x) / np.exp(x).sum()
                label = getattr(self.llm.core.model, "relevance_label",
                                None)
                out.append(float(probs[label]) if label is not None
                           else float(probs.max()))
        return out

    async def score(self, request: web.Request) -> web.Response:
        """Scores between text_1 and each text_2 (reference: /score):
        cross-encoder classification when the model has a classifier
        head, embedding dot product otherwise."""
        body = await request.json()
        if self.llm.tokenizer is None:
            return self._error("no tokenizer loaded", 400)
        t1 = body["text_1"]
        t2 = body["text_2"] if isinstance(body["text_2"], list) \
            else [body["text_2"]]
        if self._is_cross_encoder():
            scores = await self._cross_scores(t1, t2)
        else:
            embs = await self._embed_texts([t1] + t2)
            qv = embs[0]
            scores = [float((qv * d).sum()) for d in embs[1:]]
        return web.json_response({
            "object": "list", "model": self.model_name,
            "data": [{"index": i, "score": s_}
                     for i, s_ in enumerate(scores)],
        })

    async def rerank(self, request: web.Request) -> web.Response:
        """Document reranking (reference: /rerank): cross-encoder
        classification when available, embedding similarity otherwise."""
        body = await request.json()
        if self.llm.tokenizer is None:
            return self._error("no tokenizer loaded", 400)
        query = body["query"]
        docs = body["documents"]
        top_n = body.get("top_n", len(docs))
        if self._is_cross_encoder():
            sc = await self._cross_scores(query, list(docs))
            scored = sorted(((s_, i) for i, s_ in enumerate(sc)),
                            reverse=True)[:top_n]
        else:
            embs = await self._embed_texts([query] + list(docs))
            qv = embs[0]
            scored = sorted(
                ((float((qv * d).sum()), i)
                 for i, d in enumerate(embs[1:])),
                reverse=True)[:top_n]
        return web.json_response({
            "model": self.model_name,
            "results": [{"index": i, "relevance_score": s_,
                         "document": {"text": docs[i]}}
                        for s_, i in scored],
        })

    async def reload_weights(self, request: web.Request) -> web.Response:
        """RLHF/checkpoint weight swap (reference: serve/rlhf
        update_weights)."""
        body = await request.json() if request.can_read_body else {}
        try:
            self.llm.core.reload_weights(body.get("model_path"))
            return web.json_response({"status": "ok"})
        except Exception as e:  # noqa: BLE001
            return self._error(str(e), 400)

    async def start_profile(self, request: web.Request) -> web.Response:
        """JAX profiler trace (xplane) — reference: WorkerProfiler +
        /start_profile (serve/profile/api_router.py:21)."""
        import jax
        if self._profiling:
            return self._error("already profiling", 409)
        trace_dir = request.query.get(
            "dir", os.environ.get("LVLLM_PROFILE_DIR", "/tmp/lvllm_profile"))
        jax.profiler.start_trace(trace_dir)
        self._profiling = True
        return web.json_response({"status": "ok", "dir": trace_dir})

    async def stop_profile(self, request: web.Request) -> web.Response:
        import jax
        if not self._profiling:
            return self._error("not profiling", 409)
        jax.profiler.stop_trace()
        self._profiling = False
        return web.json_response({"status": "ok"})

    async def completions(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            prompt = body.get("prompt")
            if isinstance(prompt, list) and prompt and \
                    isinstance(prompt[0], str):
                prompt = prompt[0]  # single-prompt only for now
            sp = sampling_params_from_request(body)
        except (ValueError, KeyError, TypeError) as e:
            return self._error(str(e), 400)
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            return await self._stream_completion(request, rid, prompt, sp,
                                                 chat=False)
        try:
            final = None
            async for out in self.llm.generate(prompt, sp, rid):
                final = out
        except ValueError as e:
            return self._error(str(e), 400)
        c = final.outputs[0]
        return web.json_response({
            "id": rid, "object": "text_completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{
                "index": 0, "text": c.text,
                "finish_reason": c.finish_reason,
                "logprobs": None,
            }],
            "usage": self._usage(final),
        })

    async def chat_completions(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            messages = body["messages"]
            pixels = self._extract_images(messages)
            prompt = self._apply_chat_template(messages)
            mm_data = None
            if pixels is not None:
                prompt, mm_data = self._splice_image_tokens(prompt, pixels)
            sp = sampling_params_from_request(body)
        except (ValueError, KeyError, TypeError) as e:
            return self._error(str(e), 400)
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        if body.get("stream"):
            return await self._stream_completion(
                request, rid, prompt, sp, chat=True,
                tools=bool(body.get("tools")), mm_data=mm_data)
        try:
            final = None
            async for out in self.llm.generate(prompt, sp, rid,
                                               mm_data=mm_data):
                final = out
        except ValueError as e:
            return self._error(str(e), 400)
        c = final.outputs[0]
        message = {"role": "assistant", "content": c.text}
        finish_reason = c.finish_reason
        if self.reasoning_parser is not None:
            reasoning, content = self.reasoning_parser.extract(c.text)
            if reasoning is not None:
                message["reasoning_content"] = reasoning
                message["content"] = content
        if self.tool_parser is not None and body.get("tools"):
            content, calls = self.tool_parser.extract(message["content"])
            if calls:
                message["content"] = content or None
                message["tool_calls"] = [tc.to_openai() for tc in calls]
                finish_reason = "tool_calls"
        return web.json_response({
            "id": rid, "object": "chat.completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": finish_reason,
            }],
            "usage": self._usage(final),
        })

    async def responses(self, request: web.Request) -> web.Response:
        """OpenAI Responses API (reference: entrypoints/openai responses
        router): ``input`` is a string or message list; the reply is a
        response object with output items (reasoning + message)."""
        try:
            body = await request.json()
            inp = body.get("input")
            if isinstance(inp, str):
                messages = [{"role": "user", "content": inp}]
            elif isinstance(inp, list):
                messages = [m for m in inp
                            if m.get("type", "message") == "message"]
            else:
                return self._error("input must be a string or list", 400)
            if body.get("instructions"):
                messages = [{"role": "system",
                             "content": body["instructions"]}] + messages
            prompt = self._apply_chat_template(messages)
            sp = sampling_params_from_request(body)
            if body.get("max_output_tokens"):
                sp.max_tokens = int(body["max_output_tokens"])
        except (ValueError, KeyError, TypeError) as e:
            return self._error(str(e), 400)
        rid = f"resp_{uuid.uuid4().hex[:24]}"
        try:
            final = None
            async for out in self.llm.generate(prompt, sp, rid):
                final = out
        except ValueError as e:
            return self._error(str(e), 400)
        c = final.outputs[0]
        text = c.text
        output = []
        if self.reasoning_parser is not None:
            reasoning, text = self.reasoning_parser.extract(text)
            if reasoning is not None:
                output.append({
                    "type": "reasoning", "id": f"rs_{rid}",
                    "summary": [],
                    "content": [{"type": "reasoning_text",
                                 "text": reasoning}]})
        output.append({
            "type": "message", "id": f"msg_{rid}", "role": "assistant",
            "status": "completed",
            "content": [{"type": "output_text", "text": text,
                         "annotations": []}]})
        usage = self._usage(final)
        return web.json_response({
            "id": rid, "object": "response", "created_at": int(time.time()),
            "status": ("incomplete" if c.finish_reason == "length"
                       else "completed"),
            "model": self.model_name,
            "output": output,
            "output_text": text,
            "usage": {
                "input_tokens": usage.get("prompt_tokens", 0),
                "output_tokens": usage.get("completion_tokens", 0),
                "total_tokens": usage.get("total_tokens", 0),
            },
        })

    # ---- multimodal helpers ------------------------------------------------

    def _extract_images(self, messages):
        """Pull image_url content blocks (data: URLs) out of OpenAI-style
        messages, replacing them with the <image> marker; returns stacked
        pixel_values or None (reference: chat_utils mm content parsing)."""
        mc = self.llm.config.model_config
        qwen_vl = mc.mrope_section is not None
        pixel_list = []
        grids = []
        for m in messages:
            c = m.get("content")
            if not isinstance(c, list):
                continue
            parts = []
            for b in c:
                if isinstance(b, dict) and b.get("type") == "image_url":
                    if mc.image_token_id is None:
                        raise ValueError(
                            "model does not accept image input")
                    url = b.get("image_url")
                    if isinstance(url, dict):
                        url = url.get("url", "")
                    vc = mc.vision_config or {}
                    if qwen_vl:
                        # Dynamic-resolution flat patches + grid (Qwen-VL).
                        import base64
                        import io
                        from PIL import Image
                        from lvllm_tpu.multimodal import qwen_vl_patches
                        if not url.startswith("data:"):
                            raise ValueError("only data: image URLs are "
                                             "supported (no egress)")
                        _, _, b64 = url.partition("base64,")
                        img = Image.open(io.BytesIO(base64.b64decode(b64)))
                        flat, grid = qwen_vl_patches(
                            img, vc.get("patch_size", 14),
                            vc.get("spatial_merge_size", 2),
                            vc.get("temporal_patch_size", 2))
                        pixel_list.append(flat)
                        grids.append(grid)
                    else:
                        from lvllm_tpu.multimodal import pixels_from_data_url
                        pixel_list.append(pixels_from_data_url(
                            url, vc.get("image_size", 336)))
                    parts.append("<image>")
                elif isinstance(b, dict):
                    parts.append(b.get("text", ""))
            m["content"] = "".join(parts)
        if not pixel_list:
            return None
        from lvllm_tpu.multimodal import stack_images
        if grids:
            import numpy as np
            return {"pixel_values": stack_images(pixel_list),
                    "image_grid_thw": np.asarray(grids, np.int64)}
        return stack_images(pixel_list)

    def _splice_image_tokens(self, prompt: str, pixels):
        """Tokenize around <image> markers, inserting one placeholder id
        per image (expanded to the per-image token count downstream)."""
        mc = self.llm.config.model_config
        ids = []
        for i, seg in enumerate(prompt.split("<image>")):
            if i:
                ids.append(mc.image_token_id)
            if seg:
                ids.extend(self.llm.tokenizer.encode(seg))
        if isinstance(pixels, dict):
            return ids, pixels
        return ids, {"pixel_values": pixels}

    # ---- helpers -----------------------------------------------------------

    def _apply_chat_template(self, messages: List[Dict[str, str]]) -> str:
        tok = self.llm.tokenizer
        if tok is not None and getattr(tok, "chat_template", None):
            return tok.apply_chat_template(messages, tokenize=False,
                                           add_generation_prompt=True)
        # Fallback template.
        parts = [f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>"
                 for m in messages]
        parts.append("<|im_start|>assistant\n")
        return "\n".join(parts)

    def _usage(self, out) -> Dict[str, int]:
        return {
            "prompt_tokens": len(out.prompt_token_ids),
            "completion_tokens": len(out.outputs[0].token_ids),
            "total_tokens": len(out.prompt_token_ids) +
            len(out.outputs[0].token_ids),
        }

    def _error(self, msg: str, status: int) -> web.Response:
        return web.json_response(
            {"error": {"message": msg, "type": "invalid_request_error"}},
            status=status)

    async def _stream_completion(self, request, rid, prompt, sp, chat,
                                 tools=False, mm_data=None):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
        await resp.prepare(request)
        prev_len = 0
        obj = "chat.completion.chunk" if chat else "text_completion"
        # Incremental tool-call / reasoning deltas (reference:
        # extract_tool_calls_streaming, abstract_tool_parser.py:138):
        # chat streams route through a per-request parse state so clients
        # get delta.tool_calls / delta.reasoning_content instead of raw
        # markup in content.
        parse_state = None
        if chat and (self.reasoning_parser is not None
                     or (tools and self.tool_parser is not None)):
            from lvllm_tpu.streaming_parsers import StreamingParseState
            parse_state = StreamingParseState(
                tool_parser=self.tool_parser if tools else None,
                reasoning_parser=self.reasoning_parser,
                assume_reasoning_first=getattr(
                    self.reasoning_parser, "assume_started", False))

        def chunk_for(delta: dict, finish=None) -> bytes:
            choice = {"index": 0, "delta": delta, "finish_reason": finish}
            payload = {"id": rid, "object": obj,
                       "created": int(time.time()),
                       "model": self.model_name, "choices": [choice]}
            return f"data: {json.dumps(payload)}\n\n".encode()

        try:
            first = True
            async for out in self.llm.generate(prompt, sp, rid,
                                               mm_data=mm_data):
                c = out.outputs[0]
                delta_text = c.text[prev_len:]
                prev_len = len(c.text)
                if not chat:
                    choice = {"index": 0, "text": delta_text,
                              "finish_reason": c.finish_reason
                              if out.finished else None}
                    payload = {"id": rid, "object": obj,
                               "created": int(time.time()),
                               "model": self.model_name,
                               "choices": [choice]}
                    await resp.write(
                        f"data: {json.dumps(payload)}\n\n".encode())
                    continue
                if parse_state is None:
                    delta = {"content": delta_text}
                    if first:
                        delta["role"] = "assistant"
                        first = False
                    await resp.write(chunk_for(
                        delta, c.finish_reason if out.finished else None))
                    continue
                deltas = parse_state.feed(delta_text, finished=out.finished)
                for d in deltas:
                    if first:
                        d = {"role": "assistant", **d}
                        first = False
                    await resp.write(chunk_for(d))
                if out.finished:
                    finish = ("tool_calls" if parse_state.saw_tool_calls
                              else c.finish_reason)
                    await resp.write(chunk_for({}, finish))
            await resp.write(b"data: [DONE]\n\n")
        except (ConnectionResetError, asyncio.CancelledError):
            await self.llm.abort(rid)
        await resp.write_eof()
        return resp


async def serve(config: EngineConfig, host: str = "0.0.0.0",
                port: int = 8000, load_format: str = "auto",
                tokenizer=None, model_name: str = "lvllm-model",
                mesh=None, tool_parser: str = "hermes",
                reasoning: bool = True,
                reasoning_parser: str = "basic") -> None:
    llm = AsyncLLM(config, load_format=load_format, tokenizer=tokenizer,
                   mesh=mesh)
    await llm.start()
    server = OpenAIServer(llm, model_name, tool_parser=tool_parser,
                          enable_reasoning=reasoning,
                          reasoning_parser=reasoning_parser)
    runner = web.AppRunner(server.app)
    await runner.setup()
    site = web.TCPSite(runner, host, port)
    await site.start()
    logger.info("OpenAI server listening on %s:%d", host, port)
    try:
        while True:
            await asyncio.sleep(3600)
    finally:
        await llm.stop()
        await runner.cleanup()
