#!/usr/bin/env python3
"""Generate deterministic NBA-shaped bronze fixtures (FIXTURES.md) into
src/test/resources/nba/. Shapes mirror the reference bronze JSON: uppercase
API column names, games.json single-line, others pretty-printed.

Design (hand-checkable expectations for NbaPipelineSpec):
- SAS season "2024" (normalizes to 2024-25), 12 games:
  W W W W L L L W L W L W with plus_minus
  +2 +1 +3 +2 -15 -20 -9 +1 -12 +2 -6 +1  (sum -50, avg < 0)
  -> best W streak 4, worst L streak 3, biggest loss -20 (@ BOS)
- SAS season "2023-24", 8 games: W L W W L W L L with plus_minus
  +4 -6 +11 +2 -9 +15 -12 -1 -> biggest win +15 (vs. DEN)
- Non-SAS games are complementary pairs -> league avg plus_minus == 0
  per season, so 'Diferencial Puntos' is Debilidad exactly in 2024-25.
- 24 players (8 SAS/LAL/BOS each); per-metric bases are distinct
  permutations (no ties); 4 game rows per player with symmetric deltas so
  per-player averages equal the base exactly.
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "nba")
os.makedirs(OUT, exist_ok=True)

TEAMS = [
    (1610612759, "San Antonio Spurs", "SAS"),
    (1610612747, "Los Angeles Lakers", "LAL"),
    (1610612738, "Boston Celtics", "BOS"),
    (1610612743, "Denver Nuggets", "DEN"),
]
TID = {abbr: tid for tid, _, abbr in TEAMS}
TNAME = {abbr: name for _, name, abbr in TEAMS}

teams_json = [
    {"id": tid, "full_name": name, "abbreviation": abbr, "nickname": name.split()[-1],
     "city": " ".join(name.split()[:-1]), "state": "NA", "year_founded": 1970}
    for tid, name, abbr in TEAMS
]

# ---- games ----------------------------------------------------------------
games = []
gid = [1]


def add_game(season, date, home, away, home_pts, away_pts, home_pm):
    """Two team-game rows (complementary)."""
    g = f"00224{gid[0]:05d}"
    gid[0] += 1
    for abbr, opp, pts, pm, is_home in (
        (home, away, home_pts, home_pm, True),
        (away, home, away_pts, -home_pm, False),
    ):
        wl = "W" if pm > 0 else "L"
        matchup = f"{abbr} vs. {opp}" if is_home else f"{abbr} @ {opp}"
        games.append({
            "SEASON_YEAR": season, "TEAM_ID": TID[abbr],
            "TEAM_ABBREVIATION": abbr, "TEAM_NAME": TNAME[abbr],
            "GAME_ID": g, "GAME_DATE": f"{date}T00:00:00", "MATCHUP": matchup,
            "WL": wl, "PTS": pts, "FG_PCT": round(0.42 + (pts % 7) * 0.01, 3),
            "FG3_PCT": round(0.31 + (pts % 5) * 0.01, 3),
            "TOV": 10 + pts % 6, "REB": 38 + pts % 9, "BLK": 3 + pts % 4,
            "STL": 5 + pts % 5, "PLUS_MINUS": float(pm),
        })


# SAS 2024 season: 12 games (pattern/pm per module docstring)
sas24 = [("W", 2), ("W", 1), ("W", 3), ("W", 2), ("L", -15), ("L", -20),
         ("L", -9), ("W", 1), ("L", -12), ("W", 2), ("L", -6), ("W", 1)]
opps24 = ["LAL", "BOS", "DEN", "LAL", "DEN", "BOS", "LAL", "DEN", "LAL", "BOS", "DEN", "LAL"]
home24 = [True, False, True, True, False, False, True, True, False, True, False, True]
for i, ((wl, pm), opp, home) in enumerate(zip(sas24, opps24, home24)):
    date = f"2024-11-{i + 1:02d}"
    pts = 100 + i
    if home:
        add_game("2024", date, "SAS", opp, pts, pts - pm, pm)
    else:
        add_game("2024", date, opp, "SAS", pts - pm, pts, -pm)

# SAS 2023-24 season: 8 games; game 6 (+15) is 'SAS vs. DEN'
sas23 = [("W", 4), ("L", -6), ("W", 11), ("W", 2), ("L", -9), ("W", 15), ("L", -12), ("L", -1)]
opps23 = ["LAL", "BOS", "LAL", "BOS", "DEN", "DEN", "BOS", "LAL"]
home23 = [True, False, False, True, False, True, True, False]
for i, ((wl, pm), opp, home) in enumerate(zip(sas23, opps23, home23)):
    date = f"2024-01-{i + 1:02d}"
    pts = 95 + i
    if home:
        add_game("2023-24", date, "SAS", opp, pts, pts - pm, pm)
    else:
        add_game("2023-24", date, opp, "SAS", pts - pm, pts, -pm)

# extra non-SAS games (complementary -> league pm stays 0)
for season, dates in (("2024", ["2024-12-01", "2024-12-02", "2024-12-03"]),
                      ("2023-24", ["2024-02-01", "2024-02-02", "2024-02-03"])):
    add_game(season, dates[0], "LAL", "BOS", 104, 99, 5)
    add_game(season, dates[1], "BOS", "DEN", 101, 108, -7)
    add_game(season, dates[2], "DEN", "LAL", 110, 101, 9)

# ---- players & stats ------------------------------------------------------
POSITIONS = ["C", "F-C", "F", "G-F", "G", "G", "F", "C"]
players = []
player_ids = []
for t_idx, (abbr, base_id) in enumerate((("SAS", 101), ("LAL", 201), ("BOS", 301))):
    for j in range(8):
        pid = base_id + j
        player_ids.append((pid, abbr, POSITIONS[j]))
        for season in (2023, 2024):
            players.append({
                "TeamID": TID[abbr], "SEASON": season,
                "PLAYER": f"Player {pid}", "NUM": str(j + 1),
                "POSITION": POSITIONS[j], "HEIGHT": "6-7", "WEIGHT": "210",
                "AGE": 24.0 + j, "EXP": str(j), "PLAYER_ID": pid,
            })

# per-metric distinct bases via permutations coprime with 24 (no ties)
stats = []
for i, (pid, abbr, pos) in enumerate(player_ids):
    base = {
        "FG_PCT": round(0.400 + 0.004 * i, 3),
        "FG3_PCT": round(0.300 + 0.004 * ((i * 7) % 24), 3),
        "REB": round(4 + ((i * 5) % 24) * 0.4, 2),
        "TOV": round(1.0 + ((i * 11) % 24) * 0.15, 2),
        "STL": round(0.5 + ((i * 13) % 24) * 0.1, 2),
        "BLK": round(0.2 + ((i * 17) % 24) * 0.12, 2),
        "PLUS_MINUS": round(-6 + ((i * 19) % 24) * 0.5, 2),
    }
    pct_deltas = [0.01, -0.01, 0.02, -0.02]
    cnt_deltas = [0.5, -0.5, 0.25, -0.25]
    for gnum in range(4):
        row = {
            "SEASON_YEAR": "2024-25", "PLAYER_ID": pid,
            "PLAYER_NAME": f"Player {pid}", "TEAM_ID": TID[abbr],
            "TEAM_ABBREVIATION": abbr, "GAME_ID": f"0022488{gnum:03d}",
            "GAME_DATE": f"2024-11-{gnum + 1:02d}T00:00:00",
            "MATCHUP": f"{abbr} vs. LAL" if abbr != "LAL" else "LAL vs. BOS",
            "WL": "W" if gnum % 2 == 0 else "L",
        }
        for k, v in base.items():
            d = pct_deltas[gnum] if k.endswith("PCT") else cnt_deltas[gnum]
            row[k] = round(v + d, 4)
        stats.append(row)

# ---- salaries / free agents / injuries ------------------------------------
salaries = []
for pid, abbr, pos in player_ids:
    for season in (2023, 2024):
        salaries.append({
            "player_id": pid, "player_name": f"Player {pid}", "season": season,
            "salary_usd": round(500000.0 + pid * (1000 if season == 2023 else 1100), 2),
        })

free_agents = [
    {"player_id": pid, "player_name": f"Player {pid}",
     "position": dict((p, pos) for p, _, pos in player_ids)[pid],
     "age": 22 + pid % 10, "age_experience": 1 + pid % 8,
     "avalaiblefrom": "2024-07-01"}
    for pid in (105, 106, 203, 204, 302, 305)
]

injuries = [
    {"player_id": pid, "player_name": f"Player {pid}",
     "lesion": lesion, "date": date}
    for pid, lesion, date in (
        (101, "Esguince de tobillo", "2024-03-01"),
        (204, "Rotura fibrilar", "2024-02-10"),
        (204, "Esguince de tobillo", "2024-04-02"),
        (307, "Tendinitis rotuliana", "2024-01-20"),
    )
]

# ---- write ----------------------------------------------------------------
def dump(name, obj, compact=False):
    with open(os.path.join(OUT, name), "w") as f:
        if compact:
            json.dump(obj, f)          # games.json: pandas to_json style
        else:
            json.dump(obj, f, indent=4)


dump("teams.json", teams_json)
dump("players.json", players)
dump("games.json", games, compact=True)
dump("player_stats_by_game.json", stats)
dump("salaries.json", salaries)
dump("free_agents.json", free_agents)
dump("injuries.json", injuries)
print(f"wrote fixtures to {OUT}: games={len(games)} players={len(players)} "
      f"stats={len(stats)} salaries={len(salaries)}")
