"""Synthetic source fixtures shaped per FIXTURES.md (the reference's real
inputs), small enough to hand-compute goldens.

Layout written under a tmp dir:
  data/fitbit/*.csv            (5 fitbit files)
  data/gym_members_exercise_tracking.csv
  data/gym_recommendation.csv  (CSV sibling of the xlsx — read_tabular picks it up)
  data/nutrition.csv
"""

from __future__ import annotations

import csv
import os


def _write(path: str, header: list[str], rows: list[list]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def write_fixtures(base: str) -> str:
    """Create the full fixture tree; returns the data dir."""
    data = os.path.join(base, "data")
    fitbit = os.path.join(data, "fitbit")

    # -- mendeley (resolution priority 1) — 6 rows, 1 unparseable ---------
    # users: idx0→1, idx1→2, idx2 dup of idx0, idx3→3 (BMI 70 → NULL,
    # hypertension), idx4→4, idx5 bad age → skipped
    _write(
        os.path.join(data, "gym_recommendation.csv"),
        ["ID", "Sex", "Age", "Height", "Weight", "Hypertension", "Diabetes", "BMI",
         "Level", "Fitness Goal", "Fitness Type", "Exercises", "Equipment", "Diet",
         "Recommendation"],
        [
            [1, "Male", 25, 1.68, 47.5, "No", "No", 16.83, "Underweight", "Weight Gain",
             "Muscular Fitness", "Squats, deadlifts, bench presses, and overhead presses",
             "Dumbbells and barbells",
             "Vegetables: (Carrots, Sweet Potato); Protein Intake: (Eggs and Milk)", "r1"],
            [2, "Female", 30, 1.60, 55.0, "No", "Yes", 21.48, "Normal", "Weight Loss",
             "Cardio Fitness", "Running and cycling", "Treadmill",
             "Fruits: (Berries and Apples)", "r2"],
            [3, "Male", 25, 1.68, 47.5, "No", "No", 16.83, "Underweight", "Weight Gain",
             "Muscular Fitness", "Squats, deadlifts", "Dumbbells",
             "Vegetables: (Carrots, Sweet Potato)", "r3"],
            [4, "Male", 40, 1.80, 80.0, "Yes", "No", 70.0, "Obuse", "Weight Loss",
             "Cardio Fitness", "Swimming", "Pool", "Protein Intake: (Eggs and Milk)", "r4"],
            [5, "Female", 22, 1.55, 48.0, "No", "No", 19.98, "Normal", "Weight Gain",
             "Muscular Fitness", "Yoga and pilates", "Mat", "Fruits: (Berries)", "r5"],
            [6, "Male", "abc", 1.70, 60.0, "No", "No", 20.76, "Normal", "Weight Loss",
             "Cardio Fitness", "Running", "None", "Fruits: (Apples)", "r6"],
        ],
    )

    # -- gym members (priority 2) — header names carry spaces/parens ------
    # idx0 matches mendeley user1; idx1→5 (Cardio), idx2 dup of idx1,
    # idx3→6 (Strength)
    _write(
        os.path.join(data, "gym_members_exercise_tracking.csv"),
        ["Age", "Gender", "Weight (kg)", "Height (m)", "Max_BPM", "Avg_BPM",
         "Resting_BPM", "Session_Duration (hours)", "Calories_Burned", "Workout_Type",
         "Fat_Percentage", "Water_Intake (liters)", "Workout_Frequency (days/week)",
         "Experience_Level", "BMI"],
        [
            [25, "Male", 47.5, 1.68, 180, 150, 60, 1.5, 900.0, "Yoga", 20.1, 2.5, 3, 2, 16.83],
            [50, "Female", 70.0, 1.70, 170, 140, 65, 1.0, 600.0, "Cardio", 25.0, 2.0, 4, 1, 24.22],
            [50, "Female", 70.0, 1.70, 165, 135, 66, 1.2, 650.0, "Cardio", 25.0, 2.0, 4, 1, 24.22],
            [28, "Male", 90.0, 1.85, 190, 160, 55, 2.0, 1300.0, "Strength", 12.6, 3.5, 5, 3, 26.3],
        ],
    )

    # -- fitbit ----------------------------------------------------------
    _write(
        os.path.join(fitbit, "dailyActivity_merged.csv"),
        ["Id", "ActivityDate", "TotalSteps", "TotalDistance", "TrackerDistance",
         "LoggedActivitiesDistance", "VeryActiveDistance", "ModeratelyActiveDistance",
         "LightActiveDistance", "SedentaryActiveDistance", "VeryActiveMinutes",
         "FairlyActiveMinutes", "LightlyActiveMinutes", "SedentaryMinutes", "Calories"],
        [
            [101, "3/25/2016", 11004, 7.11, 7.11, 0, 2.57, 0.46, 4.07, 0, 33, 12, 205, 804, 1819],
            [101, "3/26/2016", 5000, 3.2, 3.2, 0, 1.0, 0.2, 2.0, 0, 0, 0, 120, 900, 1200],   # inactive → dropped
            [101, "12/31/2015", 8000, 5.0, 5.0, 0, 2.0, 0.5, 2.5, 0, 20, 10, 100, 850, 1500],  # out of Dim_Date → dropped
            [202, "4/2/2016", 9000, 6.0, 6.0, 0, 2.2, 0.4, 3.4, 0, 25, 15, 150, 820, 1700],
        ],
    )
    _write(
        os.path.join(fitbit, "heartrate_seconds_merged.csv"),
        ["Id", "Time", "Value"],
        [
            [202, "4/1/2016 7:54:00 AM", 90],
            [202, "4/1/2016 7:54:05 AM", 100],
            [202, "4/2/2016 8:00:00 AM", 80],
        ],
    )
    _write(
        os.path.join(fitbit, "hourlyCalories_merged.csv"),
        ["Id", "ActivityHour", "Calories"],
        [[101, "3/12/2016 12:00:00 AM", 48]],  # extracted but never consumed
    )
    _write(
        os.path.join(fitbit, "weightLogInfo_merged.csv"),
        ["Id", "Date", "WeightKg", "WeightPounds", "Fat", "BMI", "IsManualReport", "LogId"],
        [
            [101, "4/5/2016 11:59:59 PM", 53.3, 117.5, 22, 22.97, "True", 1459900799000],
            [101, "4/6/2016 11:59:59 PM", 53.5, 117.9, "", 70.0, "True", 1459987199000],  # BMI→NULL
        ],
    )
    _write(
        os.path.join(fitbit, "minuteSleep_merged.csv"),
        ["Id", "date", "value", "logId"],
        [
            [101, "3/13/2016 2:39:30 AM", 1, 11114919637],
            [101, "3/13/2016 2:40:30 AM", 1, 11114919637],
            [101, "3/13/2016 2:41:30 AM", 1, 11114919637],
            [101, "12/30/2015 1:00:00 AM", 1, 11114919000],  # out of Dim_Date → dropped
            [202, "3/14/2016 3:00:00 AM", 1, 11114920000],
        ],
    )

    # -- nutrition -------------------------------------------------------
    # carbohydrate/fat present but NOT selected (code wants carbs/fats);
    # irom/zink are the typo'd columns the cleaning list skips/hits.
    _write(
        os.path.join(data, "nutrition.csv"),
        ["Unnamed: 0", "name", "serving_size", "calories", "protein", "fiber",
         "carbohydrate", "fat", "irom", "zink"],
        [
            [0, "Cornstarch", "100 g", 381, "0.26 g", "0.9 g", "91.27 g", "0.05 g",
             "0.47 mg", "0.06 mg"],
            [1, "Rice", "100 g", 130, "2.7 g", "0.4 g", "28 g", "0.3 g", "1.2 mg", "0.5 mg"],
            [2, "Rice", "100 g", 131, "2.8 g", "0.5 g", "28 g", "0.3 g", "1.2 mg", "0.5 mg"],  # dup name → dropped
            [3, "", "100 g", 50, "1 g", "0.2 g", "10 g", "0.1 g", "0.2 mg", "0.1 mg"],  # null name → dropped
            [4, "Mystery", "100 g", "n/a", "bad", "x", "?", "?", "?", "?"],  # coerce → NULL
        ],
    )
    return data


# Golden expectations (hand-derived; see comments above):
EXPECTED_USERS = 8          # 4 mendeley + 2 gym + 2 fitbit
EXPECTED_MAPPING = 11       # 5 mendeley rows + 4 gym rows + 2 fitbit ids
EXPECTED_WORKOUT_SESSIONS = 2   # active>0 AND in Dim_Date range
EXPECTED_SLEEP_METRICS = 2      # (101, 3/13) + (202, 3/14)
EXPECTED_HR_METRICS = 2         # (202, 4/1), (202, 4/2)
EXPECTED_WEIGHT_METRICS = 4     # 2 log rows × (weight, bmi)
EXPECTED_FOOD_ITEMS = 3         # Cornstarch, Rice (first), Mystery
