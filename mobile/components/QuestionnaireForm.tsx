/**
 * Patient questionnaire. Field KEYS are the serving API's questionnaire
 * schema (age/height/weight/gender, hx_*, fhx_*, smoke/alcohol/phy_act —
 * the same key set the reference app submits,
 * /root/reference/Groove/components/QuestionnaireForm.tsx:20-81 cited for
 * the schema only); the UI itself is an original plain-RN implementation.
 */
import React from 'react'
import { StyleSheet, Text, TextInput, TouchableOpacity, View } from 'react-native'

export type FormData = Record<string, string>

const NUMERIC_FIELDS = [
  { key: 'age', label: '나이 (세)' },
  { key: 'height', label: '키 (cm)' },
  { key: 'weight', label: '체중 (kg)' },
]

const CHOICE_GROUPS = [
  {
    key: 'gender',
    label: '성별',
    options: [
      { value: '0', label: '남' },
      { value: '1', label: '여' },
    ],
  },
  {
    key: 'smoke',
    label: '흡연 여부',
    options: [
      { value: '0', label: '무' },
      { value: '1', label: '과거' },
      { value: '2', label: '현재' },
    ],
  },
  {
    key: 'alcohol',
    label: '음주 여부',
    options: [
      { value: '0', label: '무' },
      { value: '1', label: '유' },
    ],
  },
  {
    key: 'phy_act',
    label: '운동 여부',
    options: [
      { value: '0', label: '무' },
      { value: '1', label: '저강도' },
      { value: '2', label: '중강도' },
      { value: '3', label: '고강도' },
    ],
  },
]

const HISTORY_SECTIONS = [
  {
    title: '과거력',
    fields: [
      { key: 'hx_stroke', label: '뇌졸중 과거력' },
      { key: 'hx_mi', label: '심근경색 과거력' },
      { key: 'hx_htn', label: '고혈압 과거력' },
      { key: 'hx_dm', label: '당뇨병 과거력' },
      { key: 'hx_dysli', label: '이상지질혈증 과거력' },
      { key: 'hx_athero', label: '죽상경화증 과거력' },
    ],
  },
  {
    title: '가족력',
    fields: [
      { key: 'fhx_stroke', label: '뇌졸중 가족력' },
      { key: 'fhx_mi', label: '심근경색 가족력' },
      { key: 'fhx_htn', label: '고혈압 가족력' },
      { key: 'fhx_dm', label: '당뇨병 가족력' },
    ],
  },
]

interface Props {
  data: FormData
  onChange: (next: FormData) => void
}

export default function QuestionnaireForm({ data, onChange }: Props) {
  const set = (key: string, value: string) =>
    onChange({ ...data, [key]: value })

  return (
    <View>
      <View style={styles.card}>
        <Text style={styles.cardTitle}>기본 정보</Text>
        {NUMERIC_FIELDS.map((f) => (
          <View key={f.key} style={styles.field}>
            <Text style={styles.label}>{f.label}</Text>
            <TextInput
              style={styles.input}
              keyboardType="numeric"
              value={data[f.key] ?? ''}
              onChangeText={(v) => set(f.key, v)}
            />
          </View>
        ))}
      </View>

      {CHOICE_GROUPS.map((g) => (
        <View key={g.key} style={styles.card}>
          <Text style={styles.cardTitle}>{g.label}</Text>
          <View style={styles.choiceRow}>
            {g.options.map((o) => {
              const selected = data[g.key] === o.value
              return (
                <TouchableOpacity
                  key={o.value}
                  style={[styles.chip, selected && styles.chipSelected]}
                  onPress={() => set(g.key, o.value)}
                >
                  <Text
                    style={selected ? styles.chipTextSelected : styles.chipText}
                  >
                    {o.label}
                  </Text>
                </TouchableOpacity>
              )
            })}
          </View>
        </View>
      ))}

      {HISTORY_SECTIONS.map((s) => (
        <View key={s.title} style={styles.card}>
          <Text style={styles.cardTitle}>{s.title}</Text>
          {s.fields.map((f) => {
            const checked = data[f.key] === '1'
            return (
              <TouchableOpacity
                key={f.key}
                style={styles.checkRow}
                onPress={() => set(f.key, checked ? '0' : '1')}
              >
                <View style={[styles.checkbox, checked && styles.checkboxOn]}>
                  {checked ? <Text style={styles.checkmark}>✓</Text> : null}
                </View>
                <Text style={styles.label}>{f.label}</Text>
              </TouchableOpacity>
            )
          })}
        </View>
      ))}
    </View>
  )
}

const styles = StyleSheet.create({
  card: {
    backgroundColor: '#fff',
    borderRadius: 12,
    borderWidth: 1,
    borderColor: '#e5e7eb',
    padding: 16,
    marginBottom: 12,
  },
  cardTitle: { fontSize: 16, fontWeight: '700', marginBottom: 10 },
  field: { marginBottom: 10 },
  label: { fontSize: 14, color: '#111827', marginBottom: 4 },
  input: {
    borderWidth: 1,
    borderColor: '#d1d5db',
    borderRadius: 8,
    paddingHorizontal: 10,
    paddingVertical: 8,
    fontSize: 15,
  },
  choiceRow: { flexDirection: 'row', flexWrap: 'wrap', gap: 8 },
  chip: {
    borderWidth: 1,
    borderColor: '#d1d5db',
    borderRadius: 16,
    paddingHorizontal: 14,
    paddingVertical: 6,
  },
  chipSelected: { backgroundColor: '#111827', borderColor: '#111827' },
  chipText: { color: '#111827' },
  chipTextSelected: { color: '#fff' },
  checkRow: {
    flexDirection: 'row',
    alignItems: 'center',
    paddingVertical: 6,
  },
  checkbox: {
    width: 22,
    height: 22,
    borderWidth: 1,
    borderColor: '#9ca3af',
    borderRadius: 4,
    marginRight: 10,
    alignItems: 'center',
    justifyContent: 'center',
  },
  checkboxOn: { backgroundColor: '#111827', borderColor: '#111827' },
  checkmark: { color: '#fff', fontSize: 14, lineHeight: 16 },
})
