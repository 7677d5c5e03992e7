/**
 * Result screen: ECG waveform (with Grad-CAM heatmap underlay toggle),
 * diagnosis summary, 4-slice feature-importance pie (image/signal/age/wt),
 * the five-section clinical report — the response contract of
 * ecgmm_tpu/serve/api.py — and result capture/share: screenshot the
 * result view, save it to the ECG_Results media album, open the share
 * sheet (reference Groove/app/(tabs)/ResultScreen.tsx:67-91).
 */
import React, { useMemo, useRef, useState } from 'react'
import {
  Alert,
  Dimensions,
  ScrollView,
  StyleSheet,
  Text,
  TouchableOpacity,
  View,
} from 'react-native'
import { captureRef } from 'react-native-view-shot'
import * as MediaLibrary from 'expo-media-library'
import * as Sharing from 'expo-sharing'
import { EcgChart, ImportancePie } from '../components/Charts'
import type { AnalysisResult } from '../lib/api'
import { getResult } from '../lib/resultStore'

export default function ResultScreen() {
  const data = useMemo(
    () => getResult() ?? ({} as AnalysisResult),
    [],
  )
  const [showHeatmap, setShowHeatmap] = useState(false)
  const screenWidth = Dimensions.get('window').width
  const viewRef = useRef<ScrollView>(null)

  const voltages = (data.ecg_signal ?? []).map((p) => p['Voltage (mV)'])
  const fi = data.feature_importance ?? { image: 0, signal: 0, age: 0, wt: 0 }
  const abnormal = data.label === 'Abnormal'

  // Capture the result view → save to the ECG_Results media album →
  // open the share sheet (reference ResultScreen.tsx:67-91).
  const handleCapture = async () => {
    try {
      const uri = await captureRef(viewRef, { format: 'png', quality: 1 })
      const permission = await MediaLibrary.requestPermissionsAsync()
      if (permission.granted) {
        const asset = await MediaLibrary.createAssetAsync(uri)
        await MediaLibrary.createAlbumAsync('ECG_Results', asset, false)
        Alert.alert('✅ 이미지가 저장되었습니다!')
      } else {
        Alert.alert('❌ 저장 권한이 필요합니다.')
      }
      if (await Sharing.isAvailableAsync()) {
        await Sharing.shareAsync(uri)
      }
    } catch (err) {
      console.error('이미지 저장 실패:', err)
    }
  }

  return (
    <ScrollView ref={viewRef} contentContainerStyle={styles.page}>
      <View style={styles.card}>
        <Text style={styles.cardTitle}>📊 ECG 파형</Text>
        <EcgChart
          voltages={voltages}
          heatmapB64={data.heatmap}
          showHeatmap={showHeatmap}
          width={screenWidth * 2}
          height={180}
        />
        <TouchableOpacity
          style={styles.toggle}
          onPress={() => setShowHeatmap((v) => !v)}
        >
          <Text style={styles.toggleText}>
            {showHeatmap ? '주요 영역 끄기' : '주요 영역 보기'}
          </Text>
        </TouchableOpacity>
      </View>

      <View style={styles.card}>
        <Text style={styles.cardTitle}>📌 진단 요약</Text>
        <Text style={[styles.verdict, abnormal && styles.verdictAbnormal]}>
          {abnormal ? '이상 (Abnormal)' : '정상 (Normal)'}
        </Text>
        <Text style={styles.body}>
          모델 예측 확률: {((data.probability ?? 0) * 100).toFixed(1)}%
        </Text>
        {data.digitization?.scale_source === 'assumed' && (
          <Text style={styles.warn}>
            ⚠️ 사진에서 ECG 눈금(격자)을 찾지 못해 전압 크기를 추정값으로
            계산했습니다. 격자가 보이도록 다시 촬영하면 더 정확합니다.
          </Text>
        )}
        <Text style={styles.body}>
          해당 결과는 다음 항목들의 중요도를 기반으로 판단되었습니다.
        </Text>
        <ImportancePie
          size={160}
          slices={[
            { label: 'Image', value: fi.image, color: '#facc15' },
            { label: 'Signal', value: fi.signal, color: '#4ade80' },
            { label: 'Age', value: fi.age, color: '#60a5fa' },
            { label: 'Weight', value: fi.wt, color: '#c084fc' },
          ]}
        />
      </View>

      <View style={styles.card}>
        <Text style={styles.cardTitle}>🩺 임상 해석 리포트</Text>
        {data.gpt_result ? (
          Object.entries(data.gpt_result).map(([section, text]) => (
            <View key={section} style={styles.section}>
              <Text style={styles.sectionTitle}>🔹 {section}</Text>
              <Text style={styles.body}>{text}</Text>
            </View>
          ))
        ) : (
          <Text style={styles.body}>해석 없음</Text>
        )}
      </View>

      <TouchableOpacity style={styles.captureButton} onPress={handleCapture}>
        <Text style={styles.captureText}>📸 결과 저장 / 공유</Text>
      </TouchableOpacity>
    </ScrollView>
  )
}

const styles = StyleSheet.create({
  page: { padding: 16, paddingBottom: 48 },
  card: {
    backgroundColor: '#fff',
    borderRadius: 12,
    borderWidth: 1,
    borderColor: '#e5e7eb',
    padding: 16,
    marginBottom: 12,
  },
  cardTitle: { fontSize: 16, fontWeight: '700', marginBottom: 10 },
  verdict: { fontSize: 18, fontWeight: '700', color: '#16a34a' },
  verdictAbnormal: { color: '#dc2626' },
  body: { fontSize: 14, color: '#111827', marginTop: 6, lineHeight: 20 },
  warn: { fontSize: 13, color: '#b45309', marginTop: 6, lineHeight: 18 },
  toggle: {
    marginTop: 10,
    alignSelf: 'flex-start',
    borderWidth: 1,
    borderColor: '#d1d5db',
    borderRadius: 8,
    paddingHorizontal: 12,
    paddingVertical: 6,
  },
  toggleText: { fontSize: 13, color: '#111827' },
  section: {
    borderWidth: 1,
    borderColor: '#e5e7eb',
    borderRadius: 8,
    padding: 10,
    marginTop: 8,
  },
  sectionTitle: { fontWeight: '700', marginBottom: 2 },
  captureButton: {
    backgroundColor: '#2563eb',
    borderRadius: 10,
    paddingVertical: 12,
    alignItems: 'center',
    marginTop: 4,
  },
  captureText: { color: '#fff', fontSize: 15, fontWeight: '700' },
})
