"""Shared JSON-over-HTTP client for the production model seams.

`http_embed_fn` (operators/embed.py) and `http_summarize_fn`
(operators/tree.py) speak to different services with different payload
and response shapes, but the transport discipline is identical and
must stay identical — the reference clients' tenacity retries
(/root/reference/raptor/EmbeddingModels.py:94 stop_after_attempt(3),
/root/reference/raptor/SummarizationModels.py:22 stop_after_attempt(6))
recast with the engine's deliberate deviations:

- 4xx validation rejections raise IMMEDIATELY — a retry cannot fix a
  rejected payload, and looping on it would hide the data bug;
- 5xx and connection errors retry with bounded exponential backoff;
- an exhausted retry budget raises loudly so the Spark task fails and
  re-schedules — a model-service outage must never emit garbage rows.

Stdlib-only (urllib) so the seams need no extra dependency; runs
inside the Python worker.
"""

from __future__ import annotations


def post_json_with_retries(
    url: str,
    payload,
    service: str,
    max_retries: int = 3,
    timeout: float = 30.0,
):
    """POST ``payload`` as JSON to ``url`` and return the parsed JSON
    response. ``service`` names the seam in error messages (the row
    that fails should say WHICH service misbehaved)."""
    import json
    import time
    import urllib.error
    import urllib.request

    if max_retries < 1:
        # range(0) would skip the request entirely and fall through to
        # a nonsense state (empty result / 'unreachable' assert) that
        # misdirects debugging at the service — fail as a config error
        raise ValueError(f"max_retries must be >= 1, got {max_retries}")

    body = json.dumps(payload).encode()
    for attempt in range(max_retries):
        try:
            req = urllib.request.Request(
                url,
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            if 400 <= exc.code < 500:
                detail = exc.read()[:200]
                raise RuntimeError(
                    f"{service} service rejected the request "
                    f"({exc.code}): {detail!r}"
                ) from exc
            if attempt == max_retries - 1:
                raise RuntimeError(
                    f"{service} service failed after {max_retries} "
                    f"attempts: HTTP {exc.code}"
                ) from exc
            time.sleep(min(0.05 * 2**attempt, 2.0))
        except (urllib.error.URLError, OSError) as exc:
            if attempt == max_retries - 1:
                raise RuntimeError(
                    f"{service} service failed after {max_retries} "
                    f"attempts: {exc}"
                ) from exc
            time.sleep(min(0.05 * 2**attempt, 2.0))
    raise AssertionError("unreachable")  # loop always returns or raises
