"""Deterministic Spotify-shaped fixtures (FIXTURES.md §1).

Generated in pandas with a fixed seed; cardinalities are scaled-down
versions of the reference corpus (BASELINE.md). Includes every edge
case the week_on_chart golden test needs: ties at the rank-k cut,
gaps, stale entities, single-snapshot entities.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

WEEK = 7 * 24 * 3600
T0 = 1704067200  # 2024-01-01, a Monday, 00:00 UTC


def gen_spotify(
    n_artists: int = 60,
    n_albums: int = 120,
    n_tracks: int = 300,
    n_weeks: int = 8,
    seed: int = 42,
    audio_missing_frac: float = 0.05,
):
    rng = np.random.default_rng(seed)
    artist_ids = [f"ar{i:04d}" for i in range(n_artists)]
    album_ids = [f"al{i:04d}" for i in range(n_albums)]
    track_ids = [f"tr{i:05d}" for i in range(n_tracks)]
    weeks = [T0 + w * WEEK for w in range(n_weeks)]

    # audio features drawn first so popularity can carry a planted
    # signal (popularity ≈ f(danceability, energy) + noise) — makes the
    # ML tolerance gates meaningful (a model must beat the mean
    # predictor by a wide margin, like the reference's RMSE baselines)
    dance = rng.random(n_tracks)
    energy = rng.random(n_tracks)
    base_pop = np.clip(
        (60 * dance + 30 * energy + rng.normal(0, 8, n_tracks)).astype(int), 0, 100
    )
    track_artist = rng.integers(0, n_artists, n_tracks)
    track_album = rng.integers(0, n_albums, n_tracks)

    rows = []
    for w, ts in enumerate(weeks):
        # each week a subset of tracks is observed (chart persistence ~
        # the reference's 5% repeat rate, FIXTURES.md)
        active = rng.random(n_tracks) < 0.7
        pop = np.clip(base_pop + rng.integers(-10, 11, n_tracks), 0, 100)
        for i in np.nonzero(active)[0]:
            rows.append(
                (
                    track_ids[i],
                    artist_ids[track_artist[i]],
                    f"Track {i} MAÑANA{i % 7}" if i % 9 else f"Dup Name {i % 5}",
                    int(pop[i]),
                    album_ids[track_album[i]],
                    ts,
                )
            )
    tracks = pd.DataFrame(
        rows, columns=["track_id", "artist_id", "track_name", "popularity", "album_id", "timestamp"]
    )

    genres = ["pop", "rock", "jazz", "edm", "latin", "k-pop"]
    arows = []
    for w, ts in enumerate(weeks):
        for i in range(n_artists):
            if rng.random() < 0.8:
                g = [str(x) for x in rng.choice(genres, size=rng.integers(0, 4), replace=False)]
                arows.append((artist_ids[i], f"Artist {i}", g, int(rng.integers(0, 101)), ts))
    artists = pd.DataFrame(
        arows, columns=["artist_id", "artist_name", "genre", "popularity", "timestamp"]
    )

    brows = []
    for w, ts in enumerate(weeks):
        for i in range(n_albums):
            if rng.random() < 0.6:
                rd = ["2021-05-01", "2022", "2023-07"][i % 3]
                brows.append(
                    (album_ids[i], artist_ids[i % n_artists], f"Album {i}", int(rng.integers(1, 37)), rd, int(rng.integers(0, 101)), ts)
                )
    albums = pd.DataFrame(
        brows,
        columns=["album_id", "artist_id", "album_name", "total_tracks", "release_date", "popularity", "timestamp"],
    )

    with_audio = rng.random(n_tracks) >= audio_missing_frac
    audio = pd.DataFrame(
        {
            "track_id": [track_ids[i] for i in np.nonzero(with_audio)[0]],
            "danceability": dance[with_audio],
            "energy": energy[with_audio],
            "key": rng.integers(0, 12, with_audio.sum()),
            "loudness": -40 * rng.random(with_audio.sum()),
            "mode": rng.integers(0, 2, with_audio.sum()),
            "speechiness": rng.random(with_audio.sum()),
            "acousticness": rng.random(with_audio.sum()),
            "instrumentalness": rng.random(with_audio.sum()),
            "liveness": rng.random(with_audio.sum()),
            "valence": rng.random(with_audio.sum()),
            "tempo": 50 + 170 * rng.random(with_audio.sum()),
            "duration_ms": rng.integers(30000, 300000, with_audio.sum()),
            "time_signature": rng.choice([3, 4, 5], with_audio.sum()),
            "uri": "spotify:x",
            "track_href": "http://x",
            "analysis_url": "http://y",
        }
    )
    return tracks, artists, albums, audio


def reference_week_on_chart(df: pd.DataFrame, col: str, k: int = 50) -> pd.DataFrame:
    """Clean-room pandas replica of the reference algorithm
    (dag.py:118-154 semantics per SURVEY §2.6), used ONLY as a test
    oracle. Written from the spec: per-snapshot top-k by (popularity
    desc, entity asc); per-entity walk in ts order with streak +=1 when
    gap ≤ 7 days AND on chart, else reset; zero if the entity missed
    the newest snapshot by ≥ 7 days; emit the newest row + streak."""
    d = df.copy()
    d["__ts"] = pd.to_datetime(d["timestamp"], unit="s")
    top = {}
    for ts, g in d.groupby("__ts"):
        gg = g.drop_duplicates(subset=[col]).sort_values(
            ["popularity", col], ascending=[False, True], kind="mergesort"
        )
        top[ts] = set(gg.head(k)[col])
    newest = d["__ts"].max()
    out = []
    for name, g in d.sort_values([col, "__ts"], kind="mergesort").groupby(col):
        g = g.drop_duplicates(subset=["__ts"])
        streak = 0
        prev = g.iloc[0]["__ts"]
        for _, row in g.iterrows():
            gap = (row["__ts"] - prev).days
            if gap <= 7 and name in top[row["__ts"]]:
                streak += 1
            else:
                streak = 0
            prev = row["__ts"]
        if (newest - prev).days >= 7:
            streak = 0
        rec = g.iloc[-1].to_dict()
        rec["chart"] = streak
        out.append(rec)
    res = pd.DataFrame(out).drop(columns="__ts")
    return res
