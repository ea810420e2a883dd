"""RFC-822 email → elements (reference ``partition/email.py:31-441``).

Body selection prefers text/html over text/plain (reference default);
header metadata (from/to/cc/bcc/subject/message-id/date) is stamped on
every element; attachments become rows with ``attached_to_filename``
provenance — their content is recursively partitioned when the format
is supported, else a single Text element with the attachment name.
"""

from __future__ import annotations

import email
import email.policy
from email.message import EmailMessage

from unstructured_spark.parsers.html_parser import html_to_elements
from unstructured_spark.parsers.text_parser import text_to_elements


def _addresses(msg: EmailMessage, field: str) -> list[str] | None:
    vals = msg.get_all(field)
    if not vals:
        return None
    # RFC 5322 aware: display names may contain commas ("Doe, John")
    from email.utils import formataddr, getaddresses

    out: list[str] = []
    for name, addr in getaddresses([str(v) for v in vals]):
        if name or addr:
            out.append(formataddr((name or None, addr)) if addr else name)
    return out or None


def email_to_elements(raw: bytes | str, process_attachments: bool = True) -> list[dict]:
    if isinstance(raw, str):
        raw = raw.encode("utf-8", errors="replace")
    msg: EmailMessage = email.message_from_bytes(raw, policy=email.policy.default)

    meta = {
        "sent_from": _addresses(msg, "From"),
        "sent_to": _addresses(msg, "To"),
        "cc_recipient": _addresses(msg, "Cc"),
        "bcc_recipient": _addresses(msg, "Bcc"),
        "subject": str(msg.get("Subject") or "") or None,
        "email_message_id": str(msg.get("Message-ID") or "").strip("<>") or None,
        "last_modified": str(msg.get("Date") or "") or None,
    }

    html_body = msg.get_body(preferencelist=("html",))
    text_body = msg.get_body(preferencelist=("plain",))
    if html_body is not None:
        elements = html_to_elements(html_body.get_content())
    elif text_body is not None:
        elements = text_to_elements(text_body.get_content())
    else:
        elements = []

    for el in elements:
        el.update({k: v for k, v in meta.items() if v is not None})

    if process_attachments:
        from unstructured_spark.parsers import filetype as ft_mod
        from unstructured_spark.parsers.dispatch import partition_bytes

        for part in msg.iter_attachments():
            fname = part.get_filename() or "attachment"
            payload = part.get_payload(decode=True) or b""
            try:
                sub = partition_bytes(
                    payload,
                    filename=fname,
                    content_type=part.get_content_type(),
                )
            except Exception:
                sub = [{"type": "Text", "text": fname}]
            for el in sub:
                el["attached_to_filename"] = "message.eml"  # parent provenance
                el["filename"] = fname
                el.update({k: v for k, v in meta.items() if v is not None})
            elements.extend(sub)

    return elements
