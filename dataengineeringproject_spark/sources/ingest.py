"""S1: HTTP(+zip) ingest — the reference's extract task
(group_project_dag.py:36-58; identical v2:36-58, v5:36-58).

Driver-side by design: the reference GETs one URL and lands files into
a raw zone; there is no distributed read to do until the files exist.
At scale this stage is replaced by a file-drop/Kafka source the engine
reads with `spark.readStream` (streaming/ module); the landing-zone
contract (a directory of raw files) is the same either way.
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path
from urllib.request import urlopen


def ingest(url: str, dest_dir: str, filename: str = "download.csv") -> list[str]:
    """GET `url`; if the response is a zip archive (by Content-Type or
    magic bytes), extract every member into `dest_dir`, else write the
    body to `dest_dir/filename`. Returns the list of landed file paths.

    Mirrors the reference's behavior: content-type sniff for "zip"
    (group_project_dag.py:43), unzip-all-members (:46-49), single-file
    fallback (:51-55)."""
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    with urlopen(url) as resp:
        body = resp.read()
        ctype = resp.headers.get("Content-Type", "") if resp.headers else ""
    is_zip = "zip" in ctype or body[:4] == b"PK\x03\x04"
    if is_zip:
        out: list[str] = []
        with zipfile.ZipFile(io.BytesIO(body)) as zf:
            for member in zf.namelist():
                zf.extract(member, dest)
                out.append(str(dest / member))
        return out
    target = dest / filename
    target.write_bytes(body)
    return [str(target)]
