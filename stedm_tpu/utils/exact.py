"""Minimal EXACT annotation-server REST client.

Rebuild of the reference's `utils/exact_utils.py` (``ExactHandle``), which wraps the
``exact_sync`` SDK: list image sets, download WSIs, fetch annotations into a
DataFrame, and upload/clear annotations. That SDK is not available here, so this
client speaks the EXACT REST API directly over urllib with token/basic auth. All
methods require network reachability to the configured server
(configs/data/dataset/anno_server/exact_local.yaml) and raise a clear error when
offline — data prep is a one-time host-side step, never on the training path.
"""

from __future__ import annotations

import base64
import json
import shutil
import urllib.request
from pathlib import Path


def parse_vector(vector: dict) -> list[list[float]]:
    """EXACT polygon vectors are {'x1': .., 'y1': .., 'x2': ..}; return Nx2 points
    (reference her2_utils.py:38-42)."""
    points = []
    for i in range(1, len(vector) // 2 + 1):
        points.append([vector[f"x{i}"], vector[f"y{i}"]])
    return points


class ExactHandle:
    """(reference utils/exact_utils.py:22-212)"""

    def __init__(self, address: str, user: str, password: str):
        self.base = address if address.startswith("http") else f"http://{address}"
        token = base64.b64encode(f"{user}:{password}".encode()).decode()
        self._auth_header = {"Authorization": f"Basic {token}"}

    # -- internals -------------------------------------------------------

    def _get(self, path: str, params: dict | None = None):
        url = f"{self.base}/api/v1/{path}"
        if params:
            from urllib.parse import urlencode

            url += "?" + urlencode(params)
        req = urllib.request.Request(url, headers=self._auth_header)
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def _paginated(self, path: str, params: dict | None = None):
        params = dict(params or {})
        params.setdefault("limit", 100)
        offset = 0
        while True:
            page = self._get(path, {**params, "offset": offset})
            results = page.get("results", [])
            yield from results
            offset += len(results)
            if not page.get("next") or not results:
                break

    # -- public surface ----------------------------------------------------

    def get_images(self, img_set_names: list[str], dst_dir: str) -> list[tuple]:
        """Download every image of the named image sets; returns (id, local_path)
        tuples (reference exact_utils.py:42-64)."""
        dst = Path(dst_dir)
        dst.mkdir(parents=True, exist_ok=True)
        images = []
        for image_set in self._paginated("images/image_sets/"):
            if image_set["name"] not in img_set_names:
                continue
            for img_id in image_set["images"]:
                info = self._get(f"images/images/{img_id}/")
                local = dst / info["name"]
                if not local.exists():
                    req = urllib.request.Request(
                        f"{self.base}/api/v1/images/images/{img_id}/download/",
                        headers=self._auth_header)
                    with urllib.request.urlopen(req, timeout=600) as resp, \
                            open(local, "wb") as f:
                        shutil.copyfileobj(resp, f)
                images.append((img_id, local))
        return images

    def get_annotations(self, images: list[tuple], img_set_names: list[str],
                        user: int | None = None):
        """All annotations for the given images as a DataFrame with columns
        Image / Label / Vector / Product / User (reference exact_utils.py:67-110)."""
        import pandas as pd

        rows = []
        for img_id, _path in images:
            params = {"image": img_id, "expand": "annotation_type"}
            if user is not None:
                params["user"] = user
            for anno in self._paginated("annotations/annotations/", params):
                atype = anno.get("annotation_type") or {}
                rows.append({
                    "Image": img_id,
                    "Label": atype.get("name"),
                    "Vector": anno.get("vector") or {},
                    "Product": (atype.get("product") or {}).get("name")
                    if isinstance(atype.get("product"), dict) else atype.get("product"),
                    "User": (anno.get("user") or {}).get("id")
                    if isinstance(anno.get("user"), dict) else anno.get("user"),
                })
        return pd.DataFrame(rows, columns=["Image", "Label", "Vector", "Product", "User"])

    def upload_annotation(self, image_id: int, annotation_type_id: int,
                          vector: dict) -> dict:
        """(reference exact_utils.py:126-170)"""
        body = json.dumps({"image": image_id, "annotation_type": annotation_type_id,
                           "vector": vector}).encode()
        req = urllib.request.Request(
            f"{self.base}/api/v1/annotations/annotations/", data=body,
            headers={**self._auth_header, "Content-Type": "application/json"},
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def delete_annotations(self, image_id: int, user: int | None = None) -> int:
        """Clear annotations for an image (reference exact_utils.py:172-212)."""
        count = 0
        params = {"image": image_id}
        if user is not None:
            params["user"] = user
        for anno in list(self._paginated("annotations/annotations/", params)):
            req = urllib.request.Request(
                f"{self.base}/api/v1/annotations/annotations/{anno['id']}/",
                headers=self._auth_header, method="DELETE")
            urllib.request.urlopen(req, timeout=60)
            count += 1
        return count
