#!/usr/bin/env python3
"""Golden-data generator for MarktAnalyzerSpec's end-to-end test.

Builds a small deterministic monitor_records/profiles fixture and runs the
three reference analyses over it in LITERAL pandas — the code below mirrors
/root/reference/analyse.py step by step (line refs in comments) — then dumps
fixture + expected outputs as CSVs under src/test/resources/markt/.

The Scala spec (api/MarktAnalyzerSpec "end-to-end golden") loads the fixture,
runs graft.api.MarktAnalyzer, and compares against the goldens. Regenerate
with:  python3 tools/make_markt_golden.py
"""
import math
import os
import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "markt")
os.makedirs(OUT, exist_ok=True)

# --------------------------------------------------------------- fixture
# profiles: ad_unique_id, push_counter, age, profile_url, posting_time, city
# Duplicate-push rows are ordered so pandas' keep-FIRST equals the Scala
# API's explicit tiebreak (min posting_time for B, min city for C).
profiles_rows = [
    # Berlin: 12 pushes -> passes MIN_ADS_PER_CITY=10
    # b1 is duplicated with two different age groups (Script A fan-out)
    ("b1", 1, "18", "https://x/sexchat/1",              "2024-03-01 08:05:00", "Berlin"),
    ("b1", 1, "30", "https://x/sexchat/1b",             "2024-03-01 09:10:00", "Berlin"),
    ("b2", 1, "22", "https://x/sexbilder-sexvideos/2",  "2024-03-01 08:55:00", "Berlin"),
    ("b3", 1, "30", "https://x/sexbilder-sexvideos/3",  "2024-03-01 14:30:00", "  Berlin "),
    ("b4", 2, "19", "https://x/SEXCHAT/4",              "2024-03-01 23:59:00", "Berlin"),
    ("b5", 1, "17", "https://x/sexchat/5",              "2024-03-02 10:00:00", "Berlin"),
    ("b6", 1, "abc", "https://x/sexchat/6",             "2024-03-02 11:00:00", "Berlin"),
    ("b7", 1, "",   "https://x/sexchat/7",              "2024-03-02 12:00:00", "Berlin"),
    ("b8", 1, "19.5", "https://x/sexchat/8",            "2024-03-02 13:00:00", "Berlin"),
    ("b9", 1, "25", "https://x/both-sexbilder-sexvideos-sexchat/9", "2024-03-02 08:20:00", "Berlin"),
    ("b10", 1, "26", "https://x/plain/10",              "2024-03-02 14:10:00", "Berlin"),
    ("b11", 1, "21", None,                              "2024-03-02 14:40:00", "Berlin"),
    ("b12", 1, "33", "https://x/sexchat/12",            None,                  "Berlin"),
    # Hamburg: 3 pushes -> gated out of the league table
    ("h1", 1, "20", "https://x/sexchat/h1",             "2024-03-01 08:15:00", "Hamburg"),
    ("h2", 1, "27", "https://x/sexbilder-sexvideos/h2", "2024-03-01 19:45:00", "Hamburg"),
    ("h3", 1, "24", "https://x/sexchat/h3",             "2024-03-01 20:05:00", "Hamburg"),
    # dropped by Script C cleaning: blank / empty city
    ("z1", 1, "29", "https://x/sexchat/z1",             "2024-03-01 07:00:00", "   "),
    ("z2", 1, "31", "https://x/sexchat/z2",             "2024-03-01 07:30:00", ""),
]
df_profiles_src = pd.DataFrame(profiles_rows,
    columns=["ad_unique_id", "push_counter", "age", "profile_url", "posting_time", "city"])

# monitor_records: id, ad_unique_id, push_counter, track_time,
#                  ad_age_in_minutes, views
monitor_rows, _id = [], [0]
def rec(ad, push, age_min, views):
    _id[0] += 1
    monitor_rows.append((_id[0], ad, push, "2024-03-05 00:00:00", age_min, views))

rec("b1", 1, 10.0, 100.0); rec("b1", 1, 35.0, 160.0); rec("b1", 1, 90.0, 220.0); rec("b1", 1, 300.0, 400.0)
rec("b2", 1, 20.0, 50.0);  rec("b2", 1, 20.0, 55.0)                     # tie ages: delta_time=0 pair dropped
rec("b2", 1, 100.0, 80.0); rec("b2", 1, 390.0, 75.0)                    # negative gain at the end
rec("b3", 1, 38.0, 10.0);  rec("b3", 1, 110.0, 5.0);  rec("b3", 1, 350.0, 30.0)  # neg delta mid-way (rate clip)
rec("b4", 2, 5.0, 0.0);    rec("b4", 2, 60.0, 40.0);  rec("b4", 2, 119.0, 70.0); rec("b4", 2, 1300.0, 500.0)
rec("b5", 1, 15.0, 20.0);  rec("b5", 1, 80.0, 60.0)
rec("b6", 1, 25.0, 30.0);  rec("b6", 1, 95.0, 90.0)
rec("b7", 1, 12.0, 11.0);  rec("b7", 1, 44.0, 33.0)
rec("b8", 1, 18.0, 5.0);   rec("b8", 1, 77.0, 25.0)
rec("b9", 1, 30.0, 200.0); rec("b9", 1, 115.0, 320.0); rec("b9", 1, 380.0, 650.0)
rec("b10", 1, 22.0, 15.0); rec("b10", 1, 130.0, 45.0)
rec("b11", 1, 33.0, 12.0); rec("b11", 1, 140.0, 52.0)
rec("b12", 1, 8.0, 3.0);   rec("b12", 1, 70.0, 31.0)
rec("h1", 1, 25.0, 70.0);  rec("h1", 1, 100.0, 150.0); rec("h1", 1, 150.0, 180.0)
rec("h2", 1, 90.0, 40.0);  rec("h2", 1, 200.0, 90.0)                    # no record <=40 -> Script C discard
rec("h3", 1, 20.0, 25.0)                                                # single record -> time-issue discard
rec("b1", 1, 500.0, None)                                               # null views: coerced away in B/C
rec("b2", 1, None, 99.0)                                                # null age: coerced away in B/C
df_monitor_src = pd.DataFrame(monitor_rows,
    columns=["id", "ad_unique_id", "push_counter", "track_time", "ad_age_in_minutes", "views"])

df_profiles_src.to_csv(os.path.join(OUT, "profiles.csv"), index=False)
df_monitor_src.to_csv(os.path.join(OUT, "monitor_records.csv"), index=False)

# ------------------------------------------------ Script A (analyse.py:17-107)
df = pd.merge(
    df_monitor_src,
    df_profiles_src[["ad_unique_id", "push_counter", "age", "profile_url"]],
    on=["ad_unique_id", "push_counter"], how="inner")                       # :19-24
df = df[df["age"].notnull() & (df["age"] != "")].copy()                     # :28
df["age_numeric"] = pd.to_numeric(df["age"], errors="coerce")               # :29
df = df[df["age_numeric"].notnull()]                                        # :30

def assign_age_group(age):                                                  # :34-44
    if 18 <= age <= 19: return "18-19"
    elif 20 <= age <= 25: return "20-25"
    elif age >= 26: return "26+"
    return None

df["age_group"] = df["age_numeric"].apply(assign_age_group)
df = df[df["age_group"].notnull()].copy()                                   # :45
df["category"] = np.where(
    df["profile_url"].str.contains("sexbilder-sexvideos", case=False, na=False),
    "sexbilder-sexvideos",
    np.where(df["profile_url"].str.contains("sexchat", case=False, na=False),
             "sexchat", "other"))                                           # :49-57
df = df[df["category"].isin(["sexbilder-sexvideos", "sexchat"])].copy()     # :58

def compute_view_rate(df_sub):                                              # :61-76
    df_sub["ad_push"] = df_sub["ad_unique_id"] + "_" + df_sub["push_counter"].astype(str)
    df_sub = df_sub.sort_values(by=["ad_push", "ad_age_in_minutes"])
    df_sub["delta_views"] = df_sub.groupby("ad_push")["views"].diff()
    df_sub["delta_time"] = df_sub.groupby("ad_push")["ad_age_in_minutes"].diff()
    df_sub = df_sub.dropna(subset=["delta_views", "delta_time"])
    df_sub = df_sub[df_sub["delta_time"] > 0]
    df_sub["rate"] = df_sub["delta_views"] * 60 / df_sub["delta_time"]
    df_sub["rate"] = df_sub["rate"].clip(lower=0)
    df_sub["mid_age"] = df_sub["ad_age_in_minutes"] - df_sub["delta_time"] / 2
    return df_sub

def bin_and_smooth(df_sub, bin_size=5, smoothing_window=5):                 # :78-92
    bins = np.arange(0, 1440 + bin_size, bin_size)
    bin_centers = (bins[:-1] + bins[1:]) / 2
    df_sub["bin"] = pd.cut(df_sub["mid_age"], bins=bins, labels=bin_centers, include_lowest=True)
    binned = df_sub.groupby("bin", observed=False)["rate"].mean().reset_index()
    binned["bin"] = binned["bin"].astype(float)
    binned = binned.sort_values(by="bin")
    binned["smoothed_rate"] = binned["rate"].rolling(window=smoothing_window, center=True, min_periods=1).mean()
    binned["time_hours"] = binned["bin"] / 60.0
    return binned

golden_a = []
for cat in ["sexbilder-sexvideos", "sexchat"]:                              # :99-107
    for age_grp in ["18-19", "20-25", "26+"]:
        df_subset = df[(df["category"] == cat) & (df["age_group"] == age_grp)].copy()
        if df_subset.empty:
            continue
        binned = bin_and_smooth(compute_view_rate(df_subset))
        binned.insert(0, "age_group", age_grp)
        binned.insert(0, "category", cat)
        golden_a.append(binned)
pd.concat(golden_a).rename(columns={"rate": "avg_rate"}).to_csv(
    os.path.join(OUT, "golden_a_lifetime.csv"), index=False)

# ------------------------------------------------ Script B (analyse.py:150-300)
df_monitor = df_monitor_src.copy()
df_profiles = df_profiles_src[["ad_unique_id", "push_counter", "posting_time"]].copy()
df_monitor["track_time"] = pd.to_datetime(df_monitor["track_time"], errors="coerce")   # :175
df_profiles["posting_time"] = pd.to_datetime(df_profiles["posting_time"], errors="coerce")
df_monitor.dropna(subset=["track_time", "ad_age_in_minutes", "views",
                          "ad_unique_id", "push_counter"], inplace=True)               # :179
df_profiles.dropna(subset=["posting_time", "ad_unique_id", "push_counter"], inplace=True)
df_monitor["ad_age_in_minutes"] = pd.to_numeric(df_monitor["ad_age_in_minutes"], errors="coerce")
df_monitor["views"] = pd.to_numeric(df_monitor["views"], errors="coerce")
df_monitor.dropna(subset=["ad_age_in_minutes", "views"], inplace=True)                 # :186

uniq = df_profiles.drop_duplicates(subset=["ad_unique_id", "push_counter"])            # :194
uniq = uniq.copy()
uniq["posting_minute_of_day"] = uniq["posting_time"].dt.hour * 60 + uniq["posting_time"].dt.minute
num_bins = math.ceil(24 * 60 / 10)
bins = np.linspace(0, num_bins * 10, num_bins + 1)
bin_labels = [f"{int(b // 60):02d}:{int(b % 60):02d}" for b in bins[:-1]]
uniq["time_bin"] = pd.cut(uniq["posting_minute_of_day"], bins=bins, labels=bin_labels,
                          right=False, include_lowest=True)                            # :214-218
binned_counts = uniq.groupby("time_bin", observed=False).size().reindex(bin_labels, fill_value=0)  # :221-227
pd.DataFrame({"time_bin": [i * 10 for i in range(num_bins)],
              "bin_label": bin_labels,
              "n_pushes": binned_counts.values}).to_csv(
    os.path.join(OUT, "golden_b_counts.csv"), index=False)

merged = pd.merge(df_monitor,
                  df_profiles.drop_duplicates(subset=["ad_unique_id", "push_counter"]),
                  on=["ad_unique_id", "push_counter"], how="inner")                    # :235-240
initial = merged[merged["ad_age_in_minutes"] <= 119].copy()                            # :245
rate_results = []
for name, group in initial.groupby(["ad_unique_id", "push_counter"]):                  # :249-281
    group = group.sort_values("ad_age_in_minutes")
    if len(group) >= 2 and group["ad_age_in_minutes"].nunique() > 1:
        first_record, last_record = group.iloc[0], group.iloc[-1]
        delta_views = last_record["views"] - first_record["views"]
        delta_time = last_record["ad_age_in_minutes"] - first_record["ad_age_in_minutes"]
        if delta_time > 0:
            rate_results.append({"posting_hour": first_record["posting_time"].hour,
                                 "initial_views_per_hour": max(0, delta_views / delta_time * 60)})
df_rates = pd.DataFrame(rate_results)
hourly = df_rates.groupby("posting_hour")["initial_views_per_hour"].mean()
n_pushes = df_rates.groupby("posting_hour").size()
hourly = hourly.reindex(range(24), fill_value=0)                                       # :295
n_pushes = n_pushes.reindex(range(24), fill_value=0)
smoothed = hourly.rolling(window=3, center=True, min_periods=1).mean()                 # :297
pd.DataFrame({"posting_hour": range(24), "avg_initial_rate": hourly.values,
              "smoothed_rate": smoothed.values, "n_pushes": n_pushes.values}).to_csv(
    os.path.join(OUT, "golden_b_hourly.csv"), index=False)

# ------------------------------------------------ Script C (analyse.py:356-496)
df_monitor = df_monitor_src[["ad_unique_id", "push_counter", "ad_age_in_minutes", "views"]].copy()
df_profiles = df_profiles_src[["ad_unique_id", "push_counter", "city"]].copy()
df_monitor["ad_age_in_minutes"] = pd.to_numeric(df_monitor["ad_age_in_minutes"], errors="coerce")
df_monitor["views"] = pd.to_numeric(df_monitor["views"], errors="coerce")
df_monitor.dropna(subset=["ad_unique_id", "push_counter", "ad_age_in_minutes", "views"], inplace=True)  # :388
df_profiles["city"] = df_profiles["city"].str.strip()                                  # :390
df_profiles.replace("", np.nan, inplace=True)                                          # :391
df_profiles.dropna(subset=["ad_unique_id", "push_counter", "city"], inplace=True)      # :392
merged = pd.merge(df_monitor, df_profiles.drop_duplicates(subset=["ad_unique_id", "push_counter"]),
                  on=["ad_unique_id", "push_counter"], how="inner")                    # :406-411
city_counts = df_profiles.drop_duplicates(subset=["ad_unique_id", "push_counter"])["city"].value_counts()
keep = city_counts[city_counts >= 10].index.tolist()                                   # :419-423
flt = merged[merged["city"].isin(keep)].copy()                                         # :431
results = []
for name, group in flt.groupby(["ad_unique_id", "push_counter"]):                      # :437-483
    group = group.sort_values("ad_age_in_minutes")
    initial_records = group[group["ad_age_in_minutes"] <= 40]
    if initial_records.empty: continue
    earliest = initial_records.iloc[0]
    final_records = group[group["ad_age_in_minutes"] <= 400]
    if final_records.empty: continue
    latest = final_records.iloc[-1]
    if latest["ad_age_in_minutes"] <= earliest["ad_age_in_minutes"]: continue
    results.append({"city": earliest["city"],
                    "views_gained_6hr": max(0, latest["views"] - earliest["views"])})
dfv = pd.DataFrame(results)
league = dfv.groupby("city")["views_gained_6hr"].agg(["mean", "size"]).reset_index()
league.columns = ["city", "avg_views_gained", "n_pushes_used"]
league = league.sort_values(["avg_views_gained", "city"], ascending=[False, True])     # :496
league.to_csv(os.path.join(OUT, "golden_c_league.csv"), index=False)

print("fixture + goldens written to", os.path.abspath(OUT))
for f in sorted(os.listdir(OUT)):
    print(" ", f, len(open(os.path.join(OUT, f)).readlines()) - 1, "rows")
