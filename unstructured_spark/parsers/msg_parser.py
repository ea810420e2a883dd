"""Outlook ``.msg`` → elements via a minimal stdlib CFB reader (no
oxmsg dependency).

The reference uses the ``oxmsg`` package (``partition/msg.py:22-323``)
and emits the same shape as ``partition_email``: body elements plus
sender/recipient/subject metadata, and recursively-partitioned
attachments tagged with ``attached_to_filename``.

A ``.msg`` file is an MS-CFB compound document: 512-byte sectors, a
FAT chain, and a red-black directory tree whose streams hold MAPI
properties named ``__substg1.0_<prop><type>`` (type 001F = UTF-16LE,
001E = bytes). Property ids used here: 0037 subject, 0C1A sender name,
0C1F sender email, 0E04 display-to, 0E03 display-cc, 1000 body,
1013 html body; attachments live under ``__attach_version1.0_#N`` with
3704 short name / 3707 long name / 3701 content bytes.
"""

from __future__ import annotations

import io
import struct

from unstructured_spark.parsers.text_parser import text_to_elements

_HEADER_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


class CfbFile:
    """Just enough MS-CFB to enumerate streams and read their bytes."""

    def __init__(self, data: bytes):
        if data[:8] != _HEADER_MAGIC:
            raise ValueError("not a CFB container")
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.num_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.num_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.num_difat,) = struct.unpack_from("<I", data, 72)
        self.data = data

        # DIFAT: first 109 entries live in the header
        difat = list(struct.unpack_from("<109I", data, 76))
        sect = self.difat_start
        for _ in range(self.num_difat):
            if sect in (_FREESECT, _ENDOFCHAIN):
                break
            raw = self._sector(sect)
            entries = struct.unpack(f"<{self.sector_size // 4}I", raw)
            difat.extend(entries[:-1])
            sect = entries[-1]
        # FAT
        self.fat: list[int] = []
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            self.fat.extend(
                struct.unpack(f"<{self.sector_size // 4}I", self._sector(s))
            )
        # directory
        self.dir_raw = self._read_chain(self.dir_start)
        self.entries = self._parse_dir()
        # mini FAT + mini stream (root entry's stream)
        self.minifat: list[int] = []
        s = self.minifat_start
        count = 0
        # bound by the file itself, not the header-declared count: a
        # crafted num_minifat + FAT cycle must not spin ~4e9 iterations
        max_sectors = max(len(self.data) // self.sector_size, 1)
        visited: set[int] = set()
        while (
            s not in (_FREESECT, _ENDOFCHAIN)
            and count < min(self.num_minifat, max_sectors)
            and s not in visited
        ):
            visited.add(s)
            sec = self._sector(s)
            if len(sec) < self.sector_size:
                break
            self.minifat.extend(
                struct.unpack(f"<{self.sector_size // 4}I", sec)
            )
            s = self.fat[s] if s < len(self.fat) else _ENDOFCHAIN
            count += 1
        root = self.entries[0]
        self.mini_stream = self._read_chain(root["start"])[: root["size"]]

    def _sector(self, n: int) -> bytes:
        # MS-CFB: sector n starts at (n+1) << sector_shift — the header
        # occupies exactly one sector (4096 for v4, not always 512)
        off = (n + 1) * self.sector_size
        return self.data[off : off + self.sector_size]

    def _read_chain(self, start: int, limit: int = 1 << 22) -> bytes:
        out = io.BytesIO()
        s = start
        seen = 0
        while s not in (_FREESECT, _ENDOFCHAIN) and seen * self.sector_size < limit:
            out.write(self._sector(s))
            s = self.fat[s] if s < len(self.fat) else _ENDOFCHAIN
            seen += 1
        return out.getvalue()

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = io.BytesIO()
        s = start
        visited: set[int] = set()
        while s not in (_FREESECT, _ENDOFCHAIN) and out.tell() < size:
            if s in visited:
                break  # cycle in a crafted mini-FAT: stop, don't hang
            visited.add(s)
            off = s * self.mini_size
            chunk = self.mini_stream[off : off + self.mini_size]
            if not chunk:
                break  # offset past the mini stream: no progress possible
            out.write(chunk)
            s = self.minifat[s] if s < len(self.minifat) else _ENDOFCHAIN
        return out.getvalue()[:size]

    def _parse_dir(self) -> list[dict]:
        entries = []
        for off in range(0, len(self.dir_raw) - 127, 128):
            raw = self.dir_raw[off : off + 128]
            (name_len,) = struct.unpack_from("<H", raw, 64)
            if name_len == 0:
                continue
            name = raw[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
            otype = raw[66]
            (start,) = struct.unpack_from("<I", raw, 116)
            (size,) = struct.unpack_from("<Q", raw, 120)
            (left,) = struct.unpack_from("<I", raw, 68)
            (right,) = struct.unpack_from("<I", raw, 72)
            (child,) = struct.unpack_from("<I", raw, 76)
            entries.append(
                {
                    "name": name, "type": otype, "start": start, "size": size,
                    "left": left, "right": right, "child": child,
                    "index": off // 128,
                }
            )
        return entries

    def read_stream_entry(self, entry: dict) -> bytes:
        if entry["size"] < self.mini_cutoff and entry["index"] != 0:
            return self._read_mini_chain(entry["start"], entry["size"])
        return self._read_chain(entry["start"])[: entry["size"]]

    def storage_children(self, storage_index: int) -> list[dict]:
        """All entries in the subtree rooted at a storage's child."""
        by_index = {e["index"]: e for e in self.entries}
        root = by_index.get(storage_index)
        if root is None:
            return []
        out: list[dict] = []
        stack = [root["child"]]
        while stack:
            i = stack.pop()
            e = by_index.get(i)
            if e is None or i == _FREESECT:
                continue
            out.append(e)
            stack.extend([e["left"], e["right"]])
            if e["type"] == 1:  # nested storage
                stack.append(e["child"])
        return out


def _prop_text(raw: bytes, type_tag: str) -> str:
    if type_tag == "001F":
        return raw.decode("utf-16-le", errors="replace").rstrip("\x00")
    return raw.decode("utf-8", errors="replace").rstrip("\x00")


def _collect_props(entries: list[dict], cfb: CfbFile) -> dict[str, bytes]:
    props: dict[str, bytes] = {}
    for e in entries:
        name = e["name"]
        if name.startswith("__substg1.0_") and e["type"] == 2:
            props[name[len("__substg1.0_"):]] = cfb.read_stream_entry(e)
    return props


def _addresses(val: str) -> list[str]:
    return [a.strip() for a in val.replace(";", ",").split(",") if a.strip()]


def msg_to_elements(content: bytes) -> list[dict]:
    cfb = CfbFile(content)
    top = [e for e in cfb.entries if e["index"] != 0]
    props = _collect_props(top, cfb)

    def text_prop(pid: str) -> str | None:
        for tag in ("001F", "001E"):
            raw = props.get(pid + tag)
            if raw is not None:
                return _prop_text(raw, tag)
        return None

    subject = text_prop("0037")
    sender_name = text_prop("0C1A")
    sender_email = text_prop("0C1F") or text_prop("5D01")
    display_to = text_prop("0E04") or ""
    display_cc = text_prop("0E03") or ""
    body = text_prop("1000")

    sent_from = None
    if sender_email or sender_name:
        sent_from = [sender_email or sender_name]

    common = {
        "subject": subject,
        "sent_from": sent_from,
        "sent_to": _addresses(display_to) or None,
        "cc_recipient": _addresses(display_cc) or None,
    }

    out: list[dict] = []
    if body:
        for el in text_to_elements(body):
            el.update({k: v for k, v in common.items() if v is not None})
            out.append(el)
    else:
        # HTML-only messages: PR_HTML 0x1013 (binary or string form)
        html_raw = props.get("10130102") or props.get("1013001F") or props.get("1013001E")
        if html_raw:
            from unstructured_spark.parsers.html_parser import html_to_elements

            html_text = (
                html_raw.decode("utf-8", errors="replace")
                if isinstance(html_raw, bytes)
                else str(html_raw)
            )
            for el in html_to_elements(html_text):
                el.update({k: v for k, v in common.items() if v is not None})
                out.append(el)

    # attachments: __attach_version1.0_#N storages
    from unstructured_spark.parsers import dispatch as _dispatch

    attach_storages = sorted(
        (e for e in cfb.entries if e["name"].startswith("__attach_version1.0_")),
        key=lambda e: e["name"],
    )
    for storage in attach_storages:
        children = cfb.storage_children(storage["index"])
        aprops = _collect_props(children, cfb)

        def aprop(pid: str) -> str | None:
            for tag in ("001F", "001E"):
                raw = aprops.get(pid + tag)
                if raw is not None:
                    return _prop_text(raw, tag)
            return None

        fname = aprop("3707") or aprop("3704") or "attachment"
        payload = aprops.get("37010102")
        if payload is None:
            continue
        try:
            sub_els = _dispatch.partition_bytes(payload, filename=fname)
        except Exception:
            continue
        for el in sub_els:
            el["attached_to_filename"] = "message.msg"
            el["filename"] = fname
            el.update({k: v for k, v in common.items() if v is not None})
            out.append(el)
    return out
