"""OpenAI Responses API endpoint (reference: entrypoints/openai responses
router)."""

from tests.engine.test_openai_server import run_scenario


def test_responses_string_input():
    async def scenario(client):
        r = await client.post("/v1/responses", json={
            "model": "tiny-test", "input": "hello world",
            "max_output_tokens": 6, "temperature": 0})
        body = await r.json()
        assert r.status == 200, body
        assert body["object"] == "response"
        assert body["status"] in ("completed", "incomplete")
        msg = [o for o in body["output"] if o["type"] == "message"][0]
        assert msg["content"][0]["type"] == "output_text"
        assert body["output_text"] == msg["content"][0]["text"]
        assert body["usage"]["output_tokens"] == 6

    run_scenario(scenario)


def test_responses_message_list_and_instructions():
    async def scenario(client):
        r = await client.post("/v1/responses", json={
            "model": "tiny-test",
            "instructions": "be terse",
            "input": [{"type": "message", "role": "user",
                       "content": "2+2?"}],
            "max_output_tokens": 4, "temperature": 0})
        body = await r.json()
        assert r.status == 200, body
        assert body["output"][-1]["role"] == "assistant"

    run_scenario(scenario)


def test_responses_bad_input():
    async def scenario(client):
        r = await client.post("/v1/responses", json={
            "model": "tiny-test", "input": 42})
        assert r.status == 400

    run_scenario(scenario)
