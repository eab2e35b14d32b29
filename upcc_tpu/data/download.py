"""Bulk dataset downloader CLI.

Parity target: /root/reference/data/download_raw_pointclouds.py — fetches
and unpacks MVUB / 8iVFBv2 / UVG-VPC archives listed in a YAML manifest.
This environment has no network egress; the tool detects that and reports
which files would be fetched.
"""

import argparse
import os
import tarfile
import zipfile

import yaml

DEFAULT_MANIFEST = {
    "8iVFBv2": {
        "url": "https://plenodb.jpeg.org/pc/8ilabs/loot.zip",
        "sequences": ["loot", "longdress", "soldier", "redandblack"],
    },
    "MVUB": {
        "url": "https://plenodb.jpeg.org/pc/microsoft/",
        "sequences": ["andrew9", "david9", "phil9", "ricardo9", "sarah9"],
    },
    "Owlii": {
        "url": "(mpeg content repository)",
        "sequences": ["basketball_player", "dancer", "exercise", "model"],
    },
}


def _extract(path, dest):
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest)
    elif path.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(path) as t:
            t.extractall(dest)


def download_datasets(manifest_path=None, dest="./data/raw"):
    manifest = DEFAULT_MANIFEST
    if manifest_path and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = yaml.safe_load(f)
    os.makedirs(dest, exist_ok=True)
    try:
        import requests  # noqa: F401
        have_requests = True
    except ImportError:
        have_requests = False
    for name, spec in manifest.items():
        url = spec.get("url", "")
        out = os.path.join(dest, name)
        if not have_requests:
            print(f"[{name}] requests unavailable / no egress — would fetch "
                  f"{url} -> {out} (sequences: {spec.get('sequences')})")
            continue
        import requests
        os.makedirs(out, exist_ok=True)
        fname = os.path.join(out, os.path.basename(url) or "archive.zip")
        print(f"[{name}] downloading {url}")
        try:
            r = requests.get(url, stream=True, timeout=60)
            r.raise_for_status()
            with open(fname, "wb") as f:
                for chunk in r.iter_content(1 << 20):
                    f.write(chunk)
            _extract(fname, out)
        except Exception as e:  # zero-egress environments
            print(f"[{name}] download failed: {e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default="data/config/download_paths.yaml")
    ap.add_argument("--dest", default="./data/raw")
    a = ap.parse_args()
    download_datasets(a.manifest, a.dest)
