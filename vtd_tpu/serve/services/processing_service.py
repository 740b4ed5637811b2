"""Processing service: job status, cancellation, exports, annotation.

Byte-compatible outputs with reference
``app/services/processing_service.py``: CSV header row (:66-70), the
ICDAR-like XML layout (:92-137), and the annotated-video overlay (green
boxes, "text (conf)" labels, mp4v, :139-218).
"""
from __future__ import annotations

import csv
import io
import logging
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Any, Dict, List, Optional

import cv2
import numpy as np

from ...core.config import settings
from ..queue import AsyncResult, task_queue

logger = logging.getLogger(__name__)


class ProcessingService:
    def __init__(self, queue=None):
        self.queue = queue or task_queue

    # -- task control (parity :30-57) ------------------------------------
    def get_task_status(self, task_id: str) -> Dict[str, Any]:
        try:
            result = AsyncResult(task_id, self.queue)
            out: Dict[str, Any] = {"status": result.state}
            if result.state == "PROGRESS":
                out["info"] = result.info or {}
            elif result.state == "FAILURE":
                out["info"] = {"error": str(result.result)}
                out["traceback"] = result.traceback
            else:
                out["info"] = result.info or {}
            return out
        except Exception as e:
            logger.error("Failed to get task status: %s", e)
            return {"status": "UNKNOWN", "info": {"error": str(e)}}

    def cancel_task(self, task_id: str) -> bool:
        try:
            return self.queue.revoke(task_id, terminate=True)
        except Exception as e:
            logger.error("Failed to cancel task: %s", e)
            return False

    # -- exports ------------------------------------------------------------
    async def export_results_csv(self, results_data: Dict[str, Any]) -> str:
        try:
            output = io.StringIO()
            writer = csv.writer(output)
            writer.writerow(
                [
                    "frame_number", "timestamp", "text", "bbox_x1", "bbox_y1",
                    "bbox_x2", "bbox_y2", "detection_confidence",
                    "recognition_confidence",
                ]
            )
            for frame_result in results_data.get("results", []):
                fn = frame_result.get("frame_number", 0)
                ts = frame_result.get("timestamp", 0.0)
                for det in frame_result.get("detections", []):
                    bbox = det.get("bbox", [0, 0, 0, 0])
                    writer.writerow(
                        [
                            fn, ts, det.get("text", ""),
                            bbox[0], bbox[1], bbox[2], bbox[3],
                            det.get("detection_confidence", 0.0),
                            det.get("recognition_confidence", 0.0),
                        ]
                    )
            return output.getvalue()
        except Exception as e:
            logger.error("CSV export failed: %s", e)
            return ""

    async def export_results_xml(self, results_data: Dict[str, Any]) -> str:
        try:
            root = ET.Element("video_text_detection")
            summary_elem = ET.SubElement(root, "summary")
            for key, value in results_data.get("summary", {}).items():
                ET.SubElement(summary_elem, key).text = str(value)

            frames_elem = ET.SubElement(root, "frames")
            for frame_result in results_data.get("results", []):
                frame_elem = ET.SubElement(frames_elem, "frame")
                frame_elem.set(
                    "number", str(frame_result.get("frame_number", 0))
                )
                frame_elem.set(
                    "timestamp", str(frame_result.get("timestamp", 0.0))
                )
                for det in frame_result.get("detections", []):
                    obj = ET.SubElement(frame_elem, "object")
                    obj.set("transcription", det.get("text", ""))
                    obj.set(
                        "detection_confidence",
                        str(det.get("detection_confidence", 0.0)),
                    )
                    obj.set(
                        "recognition_confidence",
                        str(det.get("recognition_confidence", 0.0)),
                    )
                    x1, y1, x2, y2 = det.get("bbox", [0, 0, 0, 0])
                    for px, py in ((x1, y1), (x2, y1), (x2, y2), (x1, y2)):
                        p = ET.SubElement(obj, "Point")
                        p.set("x", str(px))
                        p.set("y", str(py))
            return ET.tostring(root, encoding="unicode")
        except Exception as e:
            logger.error("XML export failed: %s", e)
            return ""

    # -- annotated video ----------------------------------------------------
    async def create_annotated_video(
        self, video_path: str, results_data: Dict[str, Any]
    ) -> Optional[str]:
        try:
            output_dir = Path(settings.output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            output_path = output_dir / f"{Path(video_path).stem}_annotated.mp4"

            cap = cv2.VideoCapture(video_path)
            if not cap.isOpened():
                return None
            fps = cap.get(cv2.CAP_PROP_FPS)
            width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            out = cv2.VideoWriter(
                str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (width, height),
            )

            dets_by_frame = {
                fr.get("frame_number", 0): fr.get("detections", [])
                for fr in results_data.get("results", [])
            }
            frame_number = 0
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                if frame_number in dets_by_frame:
                    frame = self._draw_detections(
                        frame, dets_by_frame[frame_number]
                    )
                out.write(frame)
                frame_number += 1
            cap.release()
            out.release()
            return str(output_path)
        except Exception as e:
            logger.error("Annotated video creation failed: %s", e)
            return None

    def _draw_detections(
        self, frame: np.ndarray, detections: List[Dict[str, Any]]
    ) -> np.ndarray:
        for det in detections:
            bbox = det.get("bbox", [])
            if len(bbox) != 4:
                continue
            x1, y1, x2, y2 = (int(v) for v in bbox)
            text = det.get("text", "")
            conf = det.get("detection_confidence", 0.0)
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
            label = f"{text} ({conf:.2f})"
            (lw, lh), _ = cv2.getTextSize(
                label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1
            )
            cv2.rectangle(
                frame, (x1, y1 - lh - 10), (x1 + lw, y1), (0, 255, 0), -1
            )
            cv2.putText(
                frame, label, (x1, y1 - 5), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (0, 0, 0), 1,
            )
        return frame
