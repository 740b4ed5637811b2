"""APIClient tests against a real socket server."""
import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.app import create_app
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.http import Server

    tmp = tmp_path_factory.mktemp("live")
    settings.temp_dir = str(tmp / "temp")
    settings.output_dir = str(tmp / "out")
    settings.model_path = str(tmp / "models")
    db = Database("sqlite://")
    db.init_db()
    set_database(db)
    server = Server(create_app(start_worker=False), "127.0.0.1", 0)
    server.start_background()
    yield f"http://127.0.0.1:{server.port}"
    server.shutdown()


def test_apiclient_full_flow(live_server, tmp_path):
    from vtd_tpu.frontend.client import APIClient

    client = APIClient(live_server)
    assert client.register("c@x.com", "clientuser", "pw123")
    assert client.token

    # login with a fresh client
    c2 = APIClient(live_server)
    assert c2.login("clientuser", "pw123")
    assert not APIClient(live_server).login("clientuser", "wrong")

    # upload a real clip
    path = str(tmp_path / "c.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    for _ in range(15):
        w.write(np.zeros((48, 64, 3), np.uint8))
    w.release()
    with open(path, "rb") as f:
        content = f.read()
    video = c2.upload_video("c.mp4", content, category="driving")
    assert video and video["category"] == "driving"

    videos = c2.get_videos()
    assert len(videos) == 1

    # processing start is mocked at the task level elsewhere; here just
    # verify the job-status path returns None for a missing job
    assert c2.get_job_status(999) is None
    assert c2.get_results(video["id"]) is None  # nothing completed
    assert not c2.cancel_job(12345)
