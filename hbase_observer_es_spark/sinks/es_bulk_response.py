"""ES ``_bulk`` RESPONSE parsing + the reference's retry discipline — the
return direction of the wire layer (D19).

``sinks/es_bulk.py`` emits byte-exact ``_bulk`` REQUEST bodies; this module
closes the loop with what comes BACK. The public response format
(one JSON object, items in REQUEST ORDER — the positional pairing is the ES
API contract):

    {"took": N, "errors": true|false, "items": [
        {"update": {"_index": IDX, "_id": ID, "status": 200, ...}},
        {"delete": {"_index": IDX, "_id": ID, "status": 404,
                    "error": {"type": "...", "reason": "..."}}},
        ...]}

Reference tether (/root/reference): the coprocessor checks only
``bulkItemResponses.hasFailures()`` (ElasticsearchBulkOperator.java:117) and
on failure KEEPS the whole bulk builder — every action, including ones that
succeeded — to be re-sent at the next flush (:118-131 re-adds ``tempRequests``
wholesale on exception too). That whole-request requeue is the reference's
at-least-once story, and it is only safe because ``doc_as_upsert`` updates
and deletes are idempotent.

Two retry disciplines are provided:

* ``reference_retry_body`` — the faithful twin: any failure → the ENTIRE
  request body is the retry body (byte-identical re-POST);
* ``selective_retry_body`` — the production improvement: pair each response
  item with its request action positionally, re-send only items whose status
  is RETRYABLE (429 back-pressure and 5xx server errors), and return
  permanent failures (4xx mapping/validation errors) separately for
  dead-lettering — re-POSTing those would fail forever and re-POSTing
  succeeded actions wastes a write amplification the reference tolerates.
  Documented divergence, not a silent one.

Everything here is driver/worker-side pure string+JSON logic on
request-sized data (a body is ≤10 000 actions by the write contract); no
Spark jobs, no network. The HTTP POST itself stays out of sandbox scope —
with this module, every serializable byte in BOTH directions is covered.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

# 429 = back-pressure (ES bulk rejections), 5xx = server-side transients.
# Everything else that carries an error (400 mapping/parse, 404 delete of a
# missing doc when strict, 409 version conflict without retry_on_conflict) is
# permanent for an identical re-send.
RETRYABLE_STATUSES = frozenset({429}) | frozenset(range(500, 600))

_VERBS = ("update", "delete", "index", "create")


@dataclass(frozen=True)
class ItemOutcome:
    verb: str
    doc_id: str
    status: int
    error_type: str | None
    retryable: bool


def split_actions(body: str) -> list[str]:
    """Re-chunk a ``_bulk`` request body into its actions: an ``update``/
    ``index``/``create`` action spans two NDJSON lines (metadata + source),
    a ``delete`` one. Each returned chunk is the action's exact bytes
    (embedded newline included for two-line actions)."""
    lines = [ln for ln in body.split("\n") if ln]
    out: list[str] = []
    i = 0
    while i < len(lines):
        meta = json.loads(lines[i])
        verb = next((v for v in _VERBS if v in meta), None)
        if verb is None:
            raise ValueError(f"_bulk body: unrecognized action line {lines[i]!r}")
        if verb == "delete":
            out.append(lines[i])
            i += 1
        else:
            if i + 1 >= len(lines):
                raise ValueError(
                    f"_bulk body: {verb} action missing its source line"
                )
            out.append(lines[i] + "\n" + lines[i + 1])
            i += 2
    return out


def parse_bulk_response(response: str | dict) -> list[ItemOutcome]:
    """Parse a ``_bulk`` response into per-item outcomes, in request order."""
    data = json.loads(response) if isinstance(response, str) else response
    out: list[ItemOutcome] = []
    for item in data["items"]:
        verb = next((v for v in _VERBS if v in item), None)
        if verb is None:
            raise ValueError(f"_bulk response: unrecognized item {item!r}")
        body = item[verb]
        status = int(body["status"])
        err = body.get("error")
        out.append(
            ItemOutcome(
                verb=verb,
                doc_id=str(body.get("_id", "")),
                status=status,
                error_type=err.get("type") if err is not None else None,
                retryable=err is not None and status in RETRYABLE_STATUSES,
            )
        )
    return out


def has_failures(response: str | dict) -> bool:
    """The reference's decision bit (BulkResponse.hasFailures,
    ElasticsearchBulkOperator.java:117): any item carrying an error."""
    return any(o.error_type is not None for o in parse_bulk_response(response))


def reference_retry_body(request_body: str, response: str | dict) -> str | None:
    """The faithful twin of the reference's requeue: any failure → re-POST
    the WHOLE request body byte-identically; no failure → nothing to retry."""
    return request_body if has_failures(response) else None


def selective_retry_body(
    request_body: str, response: str | dict
) -> tuple[str | None, list[tuple[str, ItemOutcome]]]:
    """Pair response items to request actions positionally (the ES API
    contract) and split failures: returns ``(retry_body, dead_letters)``
    where ``retry_body`` is a valid ``_bulk`` body containing ONLY the
    retryable actions (verbatim bytes, original order; None if none) and
    ``dead_letters`` is the permanently-failed (action, outcome) pairs."""
    actions = split_actions(request_body)
    outcomes = parse_bulk_response(response)
    if len(actions) != len(outcomes):
        raise ValueError(
            f"_bulk pairing: {len(actions)} request actions vs "
            f"{len(outcomes)} response items — positional pairing broken"
        )
    retry: list[str] = []
    dead: list[tuple[str, ItemOutcome]] = []
    for action, outcome in zip(actions, outcomes):
        if outcome.error_type is None:
            continue
        if outcome.retryable:
            retry.append(action)
        else:
            dead.append((action, outcome))
    return ("\n".join(retry) + "\n" if retry else None), dead
