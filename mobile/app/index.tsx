/**
 * Upload screen: questionnaire + ECG strip photo + submit. On success the
 * serving response is passed to the result screen. Validation mirrors the
 * product behavior: image, age, height and weight are required.
 */
import * as ImagePicker from 'expo-image-picker'
import { useRouter } from 'expo-router'
import React, { useState } from 'react'
import {
  ActivityIndicator,
  Image,
  ScrollView,
  StyleSheet,
  Text,
  TouchableOpacity,
  View,
} from 'react-native'
import QuestionnaireForm, { FormData } from '../components/QuestionnaireForm'
import { analyzeEcg, PickedImage } from '../lib/api'
import { setResult } from '../lib/resultStore'

export default function UploadScreen() {
  const router = useRouter()
  const [form, setForm] = useState<FormData>({})
  const [image, setImage] = useState<PickedImage | null>(null)
  const [busy, setBusy] = useState(false)
  const [message, setMessage] = useState('')

  const pickImage = async () => {
    const perm = await ImagePicker.requestMediaLibraryPermissionsAsync()
    if (!perm.granted) {
      setMessage('이미지를 업로드하려면 갤러리 접근 권한이 필요합니다.')
      return
    }
    const res = await ImagePicker.launchImageLibraryAsync({
      mediaTypes: 'images',
      quality: 0.8,
    })
    if (!res.canceled && res.assets.length > 0) {
      setImage(res.assets[0])
      setMessage('')
    }
  }

  const submit = async () => {
    if (!image) return setMessage('ECG 이미지를 업로드해주세요.')
    if (!form.age || !form.weight || !form.height) {
      return setMessage('나이·키·체중을 모두 입력해주세요.')
    }
    setBusy(true)
    setMessage('')
    try {
      // hand off via the in-memory store — the multi-MB heatmap must not
      // travel through router params (URL/navigation-state limits)
      setResult(await analyzeEcg(image, form))
      router.push('/result')
    } catch (err) {
      setMessage('서버 오류가 발생했습니다. 서버 주소를 확인해주세요.')
      console.error(err)
    } finally {
      setBusy(false)
    }
  }

  return (
    <ScrollView contentContainerStyle={styles.page}>
      <Text style={styles.title}>문진 정보 입력</Text>
      <QuestionnaireForm data={form} onChange={setForm} />

      <View style={styles.card}>
        <Text style={styles.cardTitle}>ECG 이미지 (필수)</Text>
        <TouchableOpacity style={styles.button} onPress={pickImage}>
          <Text style={styles.buttonText}>이미지 선택</Text>
        </TouchableOpacity>
        {image ? (
          <Image source={{ uri: image.uri }} style={styles.preview} />
        ) : null}
      </View>

      <TouchableOpacity
        style={[styles.button, styles.submit, busy && styles.disabled]}
        onPress={submit}
        disabled={busy}
      >
        {busy ? (
          <View style={styles.busyRow}>
            <ActivityIndicator color="#fff" />
            <Text style={styles.buttonText}> 분석 중…</Text>
          </View>
        ) : (
          <Text style={styles.buttonText}>제출</Text>
        )}
      </TouchableOpacity>
      {message ? <Text style={styles.error}>{message}</Text> : null}
    </ScrollView>
  )
}

const styles = StyleSheet.create({
  page: { padding: 16, paddingBottom: 48 },
  title: { fontSize: 20, fontWeight: '700', marginBottom: 12 },
  card: {
    backgroundColor: '#fff',
    borderRadius: 12,
    borderWidth: 1,
    borderColor: '#e5e7eb',
    padding: 16,
    marginBottom: 12,
  },
  cardTitle: { fontSize: 16, fontWeight: '700', marginBottom: 10 },
  button: {
    backgroundColor: '#111827',
    borderRadius: 10,
    paddingVertical: 12,
    alignItems: 'center',
  },
  buttonText: { color: '#fff', fontSize: 15, fontWeight: '600' },
  submit: { marginTop: 4 },
  disabled: { opacity: 0.6 },
  busyRow: { flexDirection: 'row', alignItems: 'center' },
  preview: {
    width: '100%',
    height: 220,
    marginTop: 12,
    borderRadius: 8,
    borderWidth: 1,
    borderColor: '#d1d5db',
  },
  error: { color: '#dc2626', fontWeight: '600', marginTop: 10, textAlign: 'center' },
})
