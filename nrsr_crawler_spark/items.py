"""Typed record schemas for every reference item class (SURVEY §1.1-1.4).

The reference declares 18 ``scrapy.Item`` classes with per-field output
processors (/root/reference/nrsr/items.py:21-302).  This module is the
engine's schema-on-write equivalent: one ``StructType`` per item type, plus
the item-loader fold semantics (``TakeFirst``/``Join``/``MapCompose``)
re-expressed as Spark column expressions over the multi-valued extraction
arrays a parse UDF produces.

Types follow SURVEY §1.2: ids/counters parsed with ``int(...)`` in the
reference → ``long``; ``datetime.strptime`` call sites → ``timestamp``;
unprocessed multi-valued fields → ``array``; nested child items
(ClubMemberItem, VotingVoteItem, BillStepChangeItem — items.py:31,232,277)
→ ``array<struct<...>>`` on the parent.

tests/test_items.py asserts field-name parity per class against the
reference source itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# fold semantics (items.py:6; SURVEY §1.4)
TF = "take_first"      # TakeFirst(): first non-null extracted value
JOIN = "join"          # Join(): ' '.join(values)
KEEP = "keep_list"     # no output processor: keep the extracted list

S, L, T = StringType(), LongType(), TimestampType()
AS = ArrayType(StringType())

# child structs (list-valued fields on parents)
CLUB_MEMBER = StructType(
    [StructField("external_id", L), StructField("membership", S)]
)  # ClubMemberItem, items.py:31-33
VOTING_VOTE = StructType(
    [StructField("external_id", L), StructField("vote", S)]
)  # VotingVoteItem, items.py:232-237 (vote: MapCompose(filter_vote) + Join)
BILL_STEP_CHANGE = StructType(
    [
        StructField("date", T),
        StructField("author", S),
        StructField("detail", S),
        StructField("attachment_title", S),
        StructField("attachment_url", S),
    ]
)  # BillStepChangeItem, items.py:277-282
COMMITTEE_MEMBER = StructType(
    [StructField("role", S), StructField("external_id", L)]
)  # committees.py:55-65
ATTACHMENT = StructType(
    [StructField("url", S), StructField("name", S)]
)  # sessions.py:83-88
PROGRAM_POINT = StructType(
    [
        StructField("state", S),
        StructField("progpoint", S),
        StructField("parlpress", L),
        StructField("parlpress_url", S),
        StructField("text", AS),
    ]
)  # sessions.py:94-130
SCHEDULE_POINT = StructType(
    [StructField("press_num", L), StructField("text", S)]
)  # committee_schedules.py:98-110

# (field, spark type, fold) per item type; names match items.py exactly —
# verified by tests/test_items.py reflection against the reference source.
ITEM_SPECS: dict[str, list[tuple[str, object, str]]] = {
    # ClubItem, items.py:21-28
    "club": [
        ("type", S, TF), ("external_id", L, TF), ("name", S, TF),
        ("email", S, TF), ("period_num", L, TF),
        ("members", ArrayType(CLUB_MEMBER), KEEP), ("url", S, TF),
    ],
    # DailyClubItem, items.py:36-40 (clubs: sorted list-of-pairs,
    # votings.py:225-243)
    "daily_club": [
        ("type", S, TF), ("period_num", L, TF), ("date", T, TF),
        ("clubs", ArrayType(StructType([
            StructField("club", S), StructField("member_ids", ArrayType(L)),
        ])), KEEP),
    ],
    # MemberItem, items.py:43-78
    "member": [
        ("type", S, TF), ("external_id", L, TF), ("forename", S, TF),
        ("surname", S, TF), ("title", S, JOIN), ("stood_for_party", S, TF),
        ("born", T, TF), ("nationality", S, JOIN), ("residence", S, JOIN),
        ("county", S, JOIN), ("email", S, JOIN), ("images", AS, KEEP),
        ("image_urls", AS, KEEP), ("period_num", L, TF), ("url", S, TF),
        ("memberships", AS, KEEP),
    ],
    # MemberChangeItem, items.py:81-87
    "member_change": [
        ("type", S, TF), ("period_num", L, TF), ("date", T, TF),
        ("external_id", L, TF), ("change_type", S, TF), ("change_reason", S, TF),
    ],
    # DebateAppearanceItem, items.py:90-111
    "debate_appearance": [
        ("type", S, TF), ("external_id", L, TF), ("period_num", L, TF),
        ("debater_name", S, TF), ("debater_party", S, TF), ("debater_role", S, TF),
        ("start", T, TF), ("end", T, TF), ("session_num", L, TF),
        ("press_num", ArrayType(L), KEEP),  # list-typed! missing_presses.py:47
        ("appearance_type", S, JOIN), ("appearance_type_addition", S, JOIN),
        ("text", AS, KEEP), ("video_short_url", S, TF), ("video_long_url", S, TF),
    ],
    # HourOfQuestionsItem, items.py:114-153
    "hour_of_questions": [
        ("type", S, TF), ("period_num", L, TF), ("status", S, TF),
        ("external_id", L, TF), ("question_by", S, TF), ("question_date", T, TF),
        ("recipient", S, TF), ("question", S, TF), ("answer_date", T, TF),
        ("answer_by", S, TF), ("answer", S, TF), ("additional_question", S, TF),
        ("additional_answer", S, TF), ("url", S, TF),
    ],
    # AmendmentItem, items.py:156-171
    "amendment": [
        ("type", S, TF), ("external_id", L, TF), ("period_num", L, TF),
        ("press_num", L, TF), ("session_num", L, TF), ("title", S, TF),
        ("submitter", S, TF), ("other_submitters", AS, KEEP), ("date", T, TF),
        ("signed_members", AS, KEEP), ("voting_external_id", L, TF),
        ("attachments_names", AS, KEEP), ("attachments_urls", AS, KEEP),
        ("attachments", ArrayType(ATTACHMENT), KEEP), ("url", S, TF),
    ],
    # InterpellationItem, items.py:174-190
    "interpellation": [
        ("type", S, TF), ("period_num", L, TF), ("status", S, TF),
        ("asked_by", S, TF), ("external_id", L, TF), ("description", S, TF),
        ("recipients", AS, KEEP), ("date", T, TF),
        ("interpellation_session_num", L, TF), ("response_session_num", L, TF),
        ("responded_by", S, TF), ("press_num", L, TF), ("url", S, TF),
        ("attachments_names", AS, KEEP), ("attachments_urls", AS, KEEP),
        ("attachments", ArrayType(ATTACHMENT), KEEP),
    ],
    # PressItem, items.py:193-204 (only url has a processor)
    "press": [
        ("type", S, KEEP), ("title", S, KEEP), ("press_num", L, KEEP),
        ("group_num", L, KEEP), ("period_num", L, KEEP), ("press_type", S, KEEP),
        ("date", T, KEEP), ("attachments_names", AS, KEEP),
        ("attachments_urls", AS, KEEP), ("attachments", ArrayType(ATTACHMENT), KEEP),
        ("url", S, TF),
    ],
    # SessionItem, items.py:207-216
    "session": [
        ("type", S, TF), ("external_id", L, TF), ("name", S, TF),
        ("attachment_names", AS, KEEP), ("attachments_urls", AS, KEEP),
        ("attachments", ArrayType(ATTACHMENT), KEEP),
        ("program_points", ArrayType(PROGRAM_POINT), KEEP),
        ("period_num", L, KEEP), ("url", S, TF),
    ],
    # VotingItem, items.py:218-230
    "voting": [
        ("type", S, TF), ("external_id", L, TF), ("topic", S, TF),
        ("datetime", T, TF), ("session_num", L, TF), ("voting_num", L, TF),
        ("period_num", L, TF), ("press_num", L, TF), ("press_url", S, TF),
        ("result", S, TF), ("votes", ArrayType(VOTING_VOTE), KEEP), ("url", S, TF),
    ],
    # BillItem, items.py:240-250
    "bill": [
        ("type", S, TF), ("period_num", L, TF), ("external_id", L, TF),
        ("proposer", S, TF), ("delivered", T, TF), ("press_num", L, TF),
        ("current_state", S, TF), ("current_result", S, TF),
        ("category_name", S, TF), ("url", S, TF),
    ],
    # BillStepItem, items.py:253-274
    "bill_step": [
        ("type", S, TF), ("step_type", S, TF),
        ("changes", ArrayType(BILL_STEP_CHANGE), KEEP), ("bill_id", L, TF),
        ("external_id", L, TF), ("main_label", S, TF), ("body_label", S, TF),
        ("meeting_panel", S, TF), ("meeting_session_num", L, TF),
        ("meeting_resolution", S, TF), ("committees_label", S, TF),
        ("slk_label", S, TF), ("coordinator_label", S, TF),
        ("coordinator_meeting_date", T, TF), ("coordinator_name", S, TF),
        ("step_result", S, TF), ("discussed_label", S, TF),
        ("sent_standpoint", S, TF), ("sent_label", S, TF),
        ("act_num_label", S, TF), ("url", S, TF),
    ],
    # CommitteeItem, items.py:285-292
    "committee": [
        ("type", S, TF), ("period_num", L, TF), ("name", S, TF),
        ("description", S, KEEP), ("members", ArrayType(COMMITTEE_MEMBER), KEEP),
        ("url", S, TF), ("external_id", L, TF),
    ],
    # CommitteeScheduleItem, items.py:295-302
    "committeeschedule": [
        ("type", S, TF), ("period_num", L, TF), ("committee_name", S, TF),
        ("date", T, TF), ("time", S, TF), ("place", S, KEEP),
        ("points", ArrayType(SCHEDULE_POINT), KEEP),
    ],
}

# reference scrapy class name → engine item type
CLASS_TO_TYPE = {
    "ClubItem": "club",
    "DailyClubItem": "daily_club",
    "MemberItem": "member",
    "MemberChangeItem": "member_change",
    "DebateAppearanceItem": "debate_appearance",
    "HourOfQuestionsItem": "hour_of_questions",
    "AmendmentItem": "amendment",
    "InterpellationItem": "interpellation",
    "PressItem": "press",
    "SessionItem": "session",
    "VotingItem": "voting",
    "BillItem": "bill",
    "BillStepItem": "bill_step",
    "CommitteeItem": "committee",
    "CommitteeScheduleItem": "committeeschedule",
}
CHILD_STRUCTS = {
    "ClubMemberItem": CLUB_MEMBER,
    "VotingVoteItem": VOTING_VOTE,
    "BillStepChangeItem": BILL_STEP_CHANGE,
}


def schema_for(item_type: str) -> StructType:
    """StructType for an item type (schema-on-write into the lake)."""
    return StructType([StructField(n, t, True) for n, t, _ in ITEM_SPECS[item_type]])


def fold_for(item_type: str, field: str) -> str:
    for n, _, fold in ITEM_SPECS[item_type]:
        if n == field:
            return fold
    raise KeyError(f"{item_type}.{field}")


def apply_fold(extracted: Column, fold: str) -> Column:
    """Item-loader output-processor semantics over a multi-valued extraction
    array (SURVEY §1.4):

     - TakeFirst  → first non-null element      (items.py:22-28)
     - Join       → ' '.join(values)            (items.py:48-51)
     - keep-list  → pass the array through      (items.py:27,100,229)

    ``MapCompose(cleaner)`` composes *before* the fold: apply the cleaner
    with ``F.transform(arr, cleaner)`` first (cleaners live in
    functions/cleaners.py).
    """
    if fold == TF:
        return F.try_element_at(F.filter(extracted, lambda x: x.isNotNull()), F.lit(1))
    if fold == JOIN:
        return F.array_join(extracted, " ")
    if fold == KEEP:
        return extracted
    raise ValueError(fold)
